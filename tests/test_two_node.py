"""Two-virtual-node cluster smoke (round-4 VERDICT item 9).

Runs scripts/two_node_smoke.py in a SUBPROCESS: the probe owns a
two-raylet ``ray.cluster_utils.Cluster`` (separate object stores, so
the exchanges really move blocks between nodes), which must not touch
the session-scoped single-node fixture the rest of the suite shares.
The script itself asserts planted near-dup/exact structure; here we
assert it exits clean and reports both nodes alive.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_node_checkpointed_pipeline():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "two_node_smoke.py")],
        capture_output=True,
        text=True,
        timeout=360,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith('{"probe"')
    ][-1]
    out = json.loads(line)
    assert out["n_nodes"] == 2
    assert out["near_dup_components"] == 50
    assert out["exact_members"] == 20
    assert out["checkpoint_files"] > 0
