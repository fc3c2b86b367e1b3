"""python -m unravel_ray drives the flagship end to end in a fresh
process (the `ray job submit` surface)."""

import json
import os
import subprocess
import sys


def test_cli_extract_and_stats(tmp_path):
    docs = tmp_path / "docs"
    out = tmp_path / "out"
    env = dict(os.environ, PYTHONPATH="/root/repo")
    env.pop("RAY_ADDRESS", None)  # CLI must default to a local session
    gen = (
        "import ray; ray.init(address='local', num_cpus=2, "
        "include_dashboard=False, logging_level='ERROR');"
        "from unravel_ray.synth import corpus_dataset;"
        f"corpus_dataset(120, block_size=60).write_parquet({str(docs)!r});"
        "ray.shutdown()"
    )
    subprocess.run([sys.executable, "-c", gen], check=True, env=env,
                   cwd="/root/repo", capture_output=True)
    r = subprocess.run(
        [sys.executable, "-m", "unravel_ray", "extract",
         "--input", str(docs), "--output", str(out), "--num-cpus", "2"],
        check=True, env=env, cwd="/root/repo", capture_output=True,
        text=True)
    manifest = json.loads(r.stdout.strip().splitlines()[-1])
    assert manifest["n_rows"] == 120
    s = subprocess.run(
        [sys.executable, "-m", "unravel_ray", "stats",
         "--input", str(out / "raw"), "--num-cpus", "2"],
        check=True, env=env, cwd="/root/repo", capture_output=True,
        text=True)
    rows = [json.loads(ln) for ln in s.stdout.strip().splitlines()
            if ln.startswith("{")]
    assert sum(r["n_docs"] for r in rows) == 120
