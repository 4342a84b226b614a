"""Execute every python block in docs/COOKBOOK.md in order, sharing one
namespace — documentation that cannot rot (the reference's
tests/test_documentation.py stance, adapted to runnable recipes)."""

import os
import re

import pytest


def _blocks():
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "COOKBOOK.md")
    text = open(path).read()
    return re.findall(r"```python\n(.*?)```", text, re.S)


def test_cookbook_runs():
    blocks = _blocks()
    assert len(blocks) >= 10
    ns: dict = {}
    for i, src in enumerate(blocks):
        try:
            exec(compile(src, f"<cookbook block {i}>", "exec"), ns)
        except Exception as e:
            pytest.fail(f"cookbook block {i} failed: {e!r}\n--\n{src}")
