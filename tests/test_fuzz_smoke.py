"""Fixed-seed smoke runs of the differential fuzz harnesses, so the
properties they encode (backend byte-parity, module==pipeline,
combine==union, filter==set-reference) stay guarded in CI. The full
campaigns live in scripts/fuzz_*.py."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script,args", [
    ("fuzz_backends.py", ["2", "9"]),
    ("fuzz_modules.py", ["2", "9"]),
    ("fuzz_combine.py", ["2", "9"]),
    ("fuzz_filter.py", ["2", "9"]),
    ("fuzz_formats.py", ["6", "9"]),
])
def test_fuzz_smoke(script, args):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script)] + args,
        capture_output=True, text=True, timeout=540, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert r.stdout.count("OK") == int(args[0])
