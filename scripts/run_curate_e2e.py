"""End-to-end staged-curation kill-resume through the PACKAGED deployment
path (VERDICT r3 ask #7): run scripts/curate.py via spark-submit
--py-files at sf0.1, KILL the job mid-stage-2 (after the `filtered` stage
manifest commits, while `deduped` is still building), rerun the identical
command, and assert the rerun (a) resumed `filtered` from its committed
parquet, (b) recomputed only `deduped`/`packed`, and (c) produced a packed
output value-identical to an uninterrupted clean run (DuckDB row diff,
mirroring the gvsb golden-artifact protocol).

    python scripts/run_curate_e2e.py [--sf-dir /root/testdata/sf0.1]

Prints one JSON line.  Serialized by design — each spark-submit runs
alone (CLAUDE.md: never two concurrent Spark workloads).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def package_zip() -> str:
    return (
        subprocess.run(
            [sys.executable, f"{REPO}/scripts/package_pyfiles.py"],
            capture_output=True, text=True, check=True,
        ).stdout.strip().splitlines()[-1]
    )


def submit_cmd(zip_path: str, sf_dir: str, out_dir: str, cores: int) -> list[str]:
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    return [
        spark_submit,
        "--master", f"local[{cores}]",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        f"{REPO}/scripts/curate.py",
        sf_dir, out_dir, "--budget", "256",
    ]


def run_to_completion(cmd: list[str]) -> dict:
    run = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600,
        env={**os.environ, "PYTHONPATH": ""},  # engine must come from --py-files
    )
    if run.returncode != 0:
        sys.stderr.write(run.stderr[-4000:])
        raise SystemExit(run.returncode)
    return json.loads(run.stdout.strip().splitlines()[-1])


def run_and_kill_mid_stage2(cmd: list[str], out_dir: str, timeout: float = 900.0) -> float:
    """Launch the job; as soon as the `filtered` manifest commits (stage 2
    now building) wait a beat and SIGKILL the whole process group — the
    ungraceful death a preempted executor/driver actually gets."""
    proc = subprocess.Popen(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env={**os.environ, "PYTHONPATH": ""},
        start_new_session=True,
    )
    manifest = f"{out_dir}/filtered/_lineage_manifest.json"
    t0 = time.monotonic()
    try:
        while time.monotonic() - t0 < timeout:
            if os.path.exists(manifest):
                time.sleep(2.0)  # deduped mid-flight
                break
            if proc.poll() is not None:
                raise SystemExit("job finished before the kill point — nothing to resume")
            time.sleep(0.25)
        else:
            raise SystemExit("filtered manifest never appeared")
    finally:
        killed_at = time.monotonic() - t0
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
    assert os.path.exists(manifest), "kill landed before stage 1 committed"
    # the DOCUMENTED kill point is mid-`deduped`: its manifest must be
    # absent, or the rerun would legitimately resume it and the
    # resume-flags assertion would flag a healthy run as broken
    assert not os.path.exists(f"{out_dir}/deduped/_lineage_manifest.json"), (
        "deduped committed inside the kill window — shrink the sleep"
    )
    return killed_at


def diff_packed(a_dir: str, b_dir: str) -> int:
    """Exact value-level diff of two packed outputs; returns the row count
    (raises if any row differs)."""
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{a_dir}/packed/*.parquet')"
    ).fetchone()[0]
    for probe, base in ((a_dir, b_dir), (b_dir, a_dir)):
        extra = con.execute(
            f"""
            SELECT COUNT(*) FROM (
              SELECT * FROM read_parquet('{probe}/packed/*.parquet')
              EXCEPT
              SELECT * FROM read_parquet('{base}/packed/*.parquet')
            )
            """
        ).fetchone()[0]
        assert extra == 0, f"{extra} rows only in {probe}"
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--work-dir", default="/tmp/curate_e2e")
    args = ap.parse_args()

    killed = f"{args.work_dir}/killed"
    clean = f"{args.work_dir}/clean"
    shutil.rmtree(args.work_dir, ignore_errors=True)
    os.makedirs(args.work_dir, exist_ok=True)
    zip_path = package_zip()

    # 1: clean uninterrupted run (the golden artifact)
    t0 = time.monotonic()
    clean_out = run_to_completion(submit_cmd(zip_path, args.sf_dir, clean, args.cores))
    clean_sec = round(time.monotonic() - t0, 1)

    # 2: run + SIGKILL after `filtered` commits
    killed_at = run_and_kill_mid_stage2(
        submit_cmd(zip_path, args.sf_dir, killed, args.cores), killed
    )

    # 3: identical rerun — must resume filtered, recompute deduped+packed
    t1 = time.monotonic()
    resumed = run_to_completion(submit_cmd(zip_path, args.sf_dir, killed, args.cores))
    resume_sec = round(time.monotonic() - t1, 1)
    flags = {k: v["resumed"] for k, v in resumed["stages"].items()}
    assert flags == {"filtered": True, "deduped": False, "packed": False}, flags

    # 4: artifact diff vs the clean run
    n_rows = diff_packed(killed, clean)
    assert n_rows == clean_out["rows_packed"] == resumed["rows_packed"]

    print(
        json.dumps(
            {
                "metric": "curate_staged_kill_resume",
                "sf_dir": args.sf_dir,
                "clean_sec": clean_sec,
                "killed_after_sec": round(killed_at, 1),
                "resume_sec": resume_sec,
                "resume_flags": flags,
                "rows_packed": n_rows,
                "artifact_diff": "identical",
            }
        )
    )
    shutil.rmtree(args.work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
