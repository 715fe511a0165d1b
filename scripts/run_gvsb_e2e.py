#!/usr/bin/env python
"""End-to-end gvsb workflow through the PACKAGED deployment path
(VERDICT r2 #6): synthesize reference-format rant CSVs from the sf-dir
transcripts, package the engine, run scripts/submit_gvsb.py via
spark-submit --py-files in a fresh process, and (optionally) artifact-diff
the written svmlight folds against the pure-python golden hstack.

Modes:
  --mode bench   full corpus at --sf-dir, reference CLI defaults
                 (type 500/min_df 25, pos 4000/min_df 25, word off) — the
                 wall-time row for BENCH/BASELINE.md.
  --mode golden  first --limit texts, capped vocabularies, rant_bow ON, and
                 a row-by-row golden diff of every written fold line
                 (index signature exact, values allclose) — the artifact
                 correctness gate on the identical packaged code path.

Serialized by design: the synth session stops before spark-submit starts
(CLAUDE.md: never run two Spark workloads concurrently).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADER = ",".join(f"col{i}" for i in range(16))


def synth_source(sf_dir: str, dest: str, limit: int | None) -> tuple[list[str], list[int]]:
    """Reference-format good/bad rant CSVs from the sf-dir transcripts.

    Returns (texts in LOADER order: bad file then good file, labels).
    Deterministic: row i goes to the bad file iff i % 2 == 0.
    """
    from py_evalfilter_spark.plans import driver_queries as dq
    from py_evalfilter_spark.session import get_spark

    spark = get_spark(app_name="gvsb_synth")
    t = dq.transcripts_df(spark, sf_dir).select("text").orderBy("conv_id", "turn_idx")
    texts = [r["text"] or "" for r in t.toLocalIterator()]
    spark.stop()
    if limit:
        texts = texts[:limit]

    def sanitize(text: str) -> str:
        # what the CSV actually carries — golden must see the SAME text
        return (text.replace("\n", " ").replace("\r", " ").replace("'", "")) or "dummy"

    def row(i: int, safe: str, status: int) -> str:
        return f"{i},1,0,1,0,'{safe}',{status},1,5,x,y,1990,tokyo,1,eng,100"

    os.makedirs(dest, exist_ok=True)
    texts = [sanitize(t) for t in texts]
    bad = [(i, t) for i, t in enumerate(texts) if i % 2 == 0]
    good = [(i, t) for i, t in enumerate(texts) if i % 2 == 1]
    with open(f"{dest}/bad-rants.csv", "w", encoding="utf-8") as fp:
        fp.write("\n".join([HEADER] + [row(i, t, 250) for i, t in bad]))
    with open(f"{dest}/good-rants.csv", "w", encoding="utf-8") as fp:
        fp.write("\n".join([HEADER] + [row(i, t, 100) for i, t in good]))
    # loader order: bad file (label 1) unioned before good file (label -1)
    ordered = [t for _, t in bad] + [t for _, t in good]
    labels = [1] * len(bad) + [-1] * len(good)
    return ordered, labels


def run_submit(source_dir: str, out_dir: str, cfg: dict, cores: int) -> dict:
    zip_path = subprocess.run(
        [sys.executable, f"{REPO}/scripts/package_pyfiles.py"],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    run = subprocess.run(
        [
            spark_submit,
            "--master", f"local[{cores}]",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.sql.shuffle.partitions=32",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            f"{REPO}/scripts/submit_gvsb.py",
            source_dir,
            out_dir,
            json.dumps(cfg),
        ],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "PYTHONPATH": ""},  # engine must come from --py-files
    )
    if run.returncode != 0:
        sys.stderr.write(run.stderr[-4000:])
        raise SystemExit(run.returncode)
    return json.loads(run.stdout.strip().splitlines()[-1])


def golden_diff(texts: list[str], labels: list[int], out_dir: str, cfg: dict) -> dict:
    """Every written svmlight row must match a golden row: exact nonzero
    index signature, allclose values.  Bucketing by (label, index tuple)
    keeps this linear in corpus size (no all-pairs allclose)."""
    import numpy as np
    import pandas as pd

    from py_evalfilter_spark import golden
    from py_evalfilter_spark import textcore as tc

    # the loader NFKCs the rant text before every downstream block
    nfkc_texts = [tc.nfkc(t) for t in texts]
    stats = golden.golden_rant_stats(pd.Series(nfkc_texts)).to_numpy()
    blocks = [stats]
    t0 = time.perf_counter()
    type_vocab = golden.fit_vocabulary(
        nfkc_texts, tc.tokenize_token_type, ngram_range=(1, cfg["type_ngram"]),
        min_df=cfg["type_min_df"], max_features=cfg["type_max_features"],
    )
    blocks.append(
        golden.transform_counts(
            nfkc_texts, type_vocab, tc.tokenize_token_type, (1, cfg["type_ngram"])
        )
    )
    pos_vocab = golden.fit_vocabulary(
        nfkc_texts, tc.tokenize_pos, ngram_range=(1, cfg["pos_ngram"]),
        min_df=cfg["pos_min_df"], max_features=cfg["pos_max_features"],
    )
    blocks.append(
        golden.transform_counts(nfkc_texts, pos_vocab, tc.tokenize_pos, (1, cfg["pos_ngram"]))
    )
    if cfg.get("word_max_features"):
        word_vocab = golden.fit_vocabulary(
            nfkc_texts, tc.tokenize_rant, ngram_range=(1, 1),
            min_df=cfg["word_min_df"], max_features=cfg["word_max_features"],
        )
        word_idf = golden.idf_vector(nfkc_texts, word_vocab, tc.tokenize_rant, (1, 1))
        blocks.append(
            golden.transform_tfidf(
                nfkc_texts, word_vocab, word_idf, tc.tokenize_rant, (1, 1)
            )
        )
    want = np.hstack(blocks)
    golden_sec = round(time.perf_counter() - t0, 2)

    buckets: dict[tuple, list[np.ndarray]] = {}
    for lab, row in zip(labels, want):
        nz = tuple(np.flatnonzero(row).tolist())
        buckets.setdefault((lab, nz), []).append(row)

    checked = 0
    meta = json.load(open(f"{out_dir}/metadata.json"))
    n_features = meta["config"]["n_features"]
    assert n_features == want.shape[1], (n_features, want.shape)
    for fold in sorted(os.listdir(out_dir)):
        if not fold.startswith("gvsb-fold-"):
            continue
        for part in sorted(os.listdir(f"{out_dir}/{fold}")):
            if not part.startswith("part-"):
                continue
            for line in open(f"{out_dir}/{fold}/{part}", encoding="utf-8"):
                toks = line.split()
                lab = int(float(toks[0]))
                idx_val = [t.split(":") for t in toks[1:]]
                nz = tuple(int(i) - 1 for i, _ in idx_val)
                vals = np.array([float(v) for _, v in idx_val])
                cands = buckets.get((lab, nz), [])
                assert cands, f"no golden row with signature (label={lab}, nnz={len(nz)})"
                assert any(
                    np.allclose(vals, c[list(nz)], rtol=1e-7, atol=1e-9) for c in cands
                ), f"values diverge from golden (label={lab})"
                checked += 1
    return {"golden_rows_matched": checked, "golden_sec": golden_sec}


REFERENCE_CFG = dict(
    type_ngram=3, type_min_df=25, type_max_features=500,
    pos_ngram=2, pos_min_df=25, pos_max_features=4000,
    word_min_df=25, word_max_features=0,
)
GOLDEN_CFG = dict(
    type_ngram=3, type_min_df=5, type_max_features=100,
    pos_ngram=2, pos_min_df=5, pos_max_features=300,
    word_min_df=3, word_max_features=40,  # rant_bow ON
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mode", choices=["bench", "golden"], default="bench")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--work-dir", default="/tmp/gvsb_e2e")
    args = ap.parse_args()

    cfg = REFERENCE_CFG if args.mode == "bench" else GOLDEN_CFG
    limit = args.limit if args.limit else (6000 if args.mode == "golden" else None)
    work = f"{args.work_dir}_{args.mode}"
    shutil.rmtree(work, ignore_errors=True)
    src, out = f"{work}/source", f"{work}/out"

    texts, labels = synth_source(args.sf_dir, src, limit)
    result = run_submit(src, out, cfg, args.cores)
    result.update({"mode": args.mode, "n_source_rows": len(texts), "sf_dir": args.sf_dir})
    if args.mode == "golden":
        result.update(golden_diff(texts, labels, out, cfg))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
