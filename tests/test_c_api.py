"""C API build + run (c_api/tpu_ann_c.{h,c} — reference c_api/ role).

Compiles the embedded-CPython library with the repo Makefile and runs
the C example, which exercises factory/train/add/search/io/params/
reconstruct/remove/sa-codec/range-search and the error path end-to-end
in a standalone C process (no Python on the stack).
"""
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPI = os.path.join(ROOT, "c_api")


@pytest.mark.skipif(shutil.which("cc") is None or
                    shutil.which("python3-config") is None,
                    reason="no C toolchain")
def test_c_api_example_end_to_end(tmp_path):
    build = subprocess.run(["make", "-s"], cwd=CAPI,
                           capture_output=True, text=True, timeout=300)
    assert build.returncode == 0, build.stderr

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    env["JAX_PLATFORMS"] = "cpu"
    run = subprocess.run([os.path.join(CAPI, "example_c")], cwd=CAPI,
                         capture_output=True, text=True, timeout=600,
                         env=env)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "C API example: OK" in run.stdout
