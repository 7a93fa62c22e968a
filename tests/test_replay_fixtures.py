"""Replay-assert the committed trajectory fixtures (tools/compare_reference).

The fixtures under tests/fixtures/ were recorded with
`tools/compare_reference.py dump <env> --impl ours`; replaying them locks
the FULL env-level trajectory (reset sampling, physics, task logic, reward,
done) at fixture precision. The identical code path validates
reference-side fixtures: drop a `--impl reference` dump into the directory
and it is asserted against the cross-implementation tolerance instead.
"""

import glob
import json
import os

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.npz")))

# our own dumps replay bit-exactly on the same backend; reference dumps are
# held to the float32-drift gate (SURVEY.md §7 item 3)
TOL = {"ours": 0.0, "reference": 1e-3}


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_replay_fixture(path):
    from tools.compare_reference import run_ours

    fx = np.load(path)
    meta = json.loads(str(fx["meta"]))
    tol = TOL[meta["impl"]]
    obs0, obs, rew, done, _ = run_ours(
        meta["env"], meta["steps"], meta["seed"], actions=fx["actions"])
    np.testing.assert_allclose(obs0, fx["reset_obs"], atol=tol)
    np.testing.assert_allclose(obs, fx["obs"], atol=tol)
    np.testing.assert_allclose(rew, fx["reward"], atol=tol)
    np.testing.assert_array_equal(done, fx["done"])


def test_fixtures_exist():
    assert len(FIXTURES) >= 3, (
        "expected committed fixtures for the three PO envs; regenerate with "
        "tools/compare_reference.py dump")
