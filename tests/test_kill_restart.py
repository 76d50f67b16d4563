"""Kill/restart resumability: a run killed mid-pipeline resumes from the last
completed checkpoint without recomputing it (north-rule requirement)."""

from __future__ import annotations

import os
import subprocess
import sys

KILLED_SCRIPT = """
import os, sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from folkscope_ray.synth import corpus_path
from folkscope_ray.pipelines.kg import build_kg
kg = build_kg(corpus_path(200), run_dir=sys.argv[1])
kg.scored().count()          # completes the "scored" checkpoint
os._exit(137)                # hard kill BEFORE any later stage runs
"""


def test_killed_run_resumes_without_recompute(tmp_path):
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir, exist_ok=True)
    proc = subprocess.run(
        [sys.executable, "-c", KILLED_SCRIPT, run_dir],
        capture_output=True, text=True,
    )
    assert proc.returncode == 137
    assert os.path.exists(os.path.join(run_dir, "scored.manifest.json"))
    assert not os.path.exists(os.path.join(run_dir, "triples.manifest.json"))
    scored_mtime = os.path.getmtime(os.path.join(run_dir, "scored.manifest.json"))

    # restart in THIS process (the session-scoped ray fixture is live)
    from folkscope_ray.pipelines.kg import build_kg
    from folkscope_ray.synth import corpus_path

    kg = build_kg(corpus_path(200), run_dir=run_dir)
    n = kg.triples().count()
    assert n > 0
    # the parsed checkpoint was reused, not recomputed
    assert os.path.getmtime(os.path.join(run_dir, "scored.manifest.json")) == scored_mtime
    assert os.path.exists(os.path.join(run_dir, "triples.manifest.json"))
