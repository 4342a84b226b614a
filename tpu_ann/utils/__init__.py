"""Datasets, evaluation, IO, and host-side helpers."""

from . import datasets, evaluation  # noqa: F401
