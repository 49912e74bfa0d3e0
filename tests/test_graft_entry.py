"""Driver-contract tests for __graft_entry__.

The driver imports `__graft_entry__` in a FRESH process with the image's
default env (JAX_PLATFORMS=axon via sitecustomize, no XLA_FLAGS) and calls
`dryrun_multichip(8)`. Round 1 failed exactly that call (MULTICHIP_r01.json
rc=1: the env bootstrap lived only under __main__), so this test invokes it
in precisely the driver's form (VERDICT.md "Next round" #1).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_invocation():
    env = dict(os.environ)
    # Reconstruct the driver env: no forced CPU mesh, axon platform selected.
    # dryrun_multichip must force the virtual CPU mesh itself BEFORE any
    # backend initializes (so the axon tunnel is never touched).
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "axon"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout or "") + (proc.stderr or "")
    assert "dryrun_multichip OK" in proc.stdout
