"""Mid-shuffle kill/resume: SIGKILL the flagship while the edges stage
(the candidate-explode + verify shuffle) is in flight, resume from the
same checkpoint dir, and require the resumed run's components to be
BIT-identical to an uninterrupted control run.

This is the north rule's "a killed job resumes mid-shuffle" criterion
driven end-to-end in fresh processes (each owning its Ray session).
Default corpus is CI-sized (override with ``GRAFT_KILL_ROWS``); the
960k-doc evidence row lives in BASELINE.md and was produced by the
same harness. Marked slow: three subprocess pipeline runs."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("GRAFT_KILL_ROWS", "20000"))


def _probe(pages_dir: str, ck: str, cpus: int = 6,
           timeout: int = 1800) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "kill_resume_probe.py"),
         pages_dir, str(cpus), ck],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
        start_new_session=True,  # kill the whole Ray process group
    )


def _wait_json(proc: subprocess.Popen, timeout: int = 1800) -> dict:
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, out + err
    return json.loads(out.strip().splitlines()[-1])


@pytest.mark.slow
def test_kill_mid_shuffle_then_resume_bit_identical(tmp_path):
    from ordinarydumpdeduplicator_ray.sources.synth import write_pages_corpus

    pages_dir = write_pages_corpus(
        str(tmp_path / "pages"), ROWS, seed=42, shards=16
    )
    ck = str(tmp_path / "ck")
    ck_control = str(tmp_path / "ck_control")

    # run A: kill while the edges shuffle is in flight. The pipeline
    # enters build_edges (bucket explode -> sort -> verify joins) the
    # moment the groups_exact manifest lands; the dwell before the
    # SIGKILL scales with the MEASURED pipeline speed (a fixed dwell
    # breaks whenever the shared box runs 2-3x faster or slower): a
    # quarter of the signatures->groups_exact span, clamped, sits well
    # inside the edges window at every box speed and corpus size.
    proc = _probe(pages_dir, ck)
    sig_manifest = os.path.join(ck, "signatures", "MANIFEST.json")
    ge_manifest = os.path.join(ck, "groups_exact", "MANIFEST.json")
    deadline = time.time() + 1500
    killed = False
    t_sig = None
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                break  # finished before we could kill (corpus too small)
            if t_sig is None and os.path.exists(sig_manifest):
                t_sig = time.time()
            if os.path.exists(ge_manifest):
                dwell = min(5.0, max(0.2, 0.25 * (time.time() - t_sig))
                            ) if t_sig else 0.5
                time.sleep(dwell)
                if proc.poll() is None:
                    os.killpg(proc.pid, signal.SIGKILL)
                    killed = True
                break
            time.sleep(0.05)
        proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
    assert killed, "pipeline finished before the kill window; raise ROWS"
    # the kill must have landed mid-run: no components checkpoint yet
    assert not os.path.exists(
        os.path.join(ck, "components", "MANIFEST.json")
    ), "kill landed after components completed; lower KILL_DELAY"

    # run B: resume from the same checkpoint dir in a fresh process
    resumed = _wait_json(_probe(pages_dir, ck))
    # the scan (and any stage whose manifest completed) must be skipped,
    # the interrupted shuffle recomputed
    assert resumed["resumed"]["signatures"] is True
    assert resumed["resumed"]["edges"] is False

    # run C: uninterrupted control in a separate checkpoint dir
    control = _wait_json(_probe(pages_dir, ck_control))
    assert resumed["components"] == control["components"]
    assert resumed["components"][0] > 0
