#!/usr/bin/env python
"""End-to-end PRICE workflow through the PACKAGED deployment path
(VERDICT r4 #6 — the gvsb protocol, scripts/run_gvsb_e2e.py, applied to the
richer price FeatureUnion: userprofile one-hot block + rant stats + type /
POS / optional word BoW blocks, reference generate_dataset_price.py:50-171):
synthesize a reference-format price CSV from the sf-dir transcripts with
varied profile fields, package the engine, run scripts/submit_price.py via
spark-submit --py-files in a fresh process, and (optionally) artifact-diff
every written svmlight fold row against the pure-python golden hstack.

Modes:
  --mode bench   full corpus at --sf-dir, reference price CLI defaults
                 (type 1000/min_df 10, pos 3000/min_df 25, word off) — the
                 wall-time row for BENCH/BASELINE.md.
  --mode golden  first --limit texts, capped vocabularies, rant_bow ON, and
                 a row-by-row golden diff of every written fold line
                 (label + index signature exact, values allclose) on the
                 identical packaged code path.

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

RUN_YEAR = 2016  # the loader's pinned get_age run date (rants_csv.age_col)

# deterministic per-row profile fields: every categorical domain gets
# multiple values so the one-hot block is non-trivial
_GENDERS = ["1", "2", "\\0", "9"]  # male / female / unk-sentinel / unk


def _profile_fields(i: int) -> dict:
    return {
        "hasindustry": i % 2,
        "hasoccupation": (i // 2) % 2,
        "hascompany": (i // 3) % 2,
        "hasprodname": (i // 5) % 2,
        "hasproposal": (i // 7) % 2,
        "empathies": i % 17,
        "birthyear": 0 if i % 10 == 0 else 1950 + (i % 50),
        "state": f"state{i % 5}",
        "gender_raw": _GENDERS[i % 4],
        "job": f"job{i % 4}",
        "price": (i * 37) % 5000,
    }


def synth_source(sf_dir: str, dest: str, limit: int | None) -> list[str]:
    """Reference-format price CSV (16 columns, _c15 = price) from the
    sf-dir transcripts.  Returns the texts in loader (file) order."""
    from py_evalfilter_spark.plans import driver_queries as dq
    from py_evalfilter_spark.session import get_spark

    spark = get_spark(app_name="price_synth")
    t = dq.transcripts_df(spark, sf_dir).select("text").orderBy("conv_id", "turn_idx")
    texts = [r["text"] or "" for r in t.toLocalIterator()]
    spark.stop()
    if limit:
        texts = texts[:limit]

    def sanitize(text: str) -> str:
        return (text.replace("\n", " ").replace("\r", " ").replace("'", "")) or "dummy"

    texts = [sanitize(t) for t in texts]
    os.makedirs(dest, exist_ok=True)
    rows = []
    for i, t in enumerate(texts):
        p = _profile_fields(i)
        rows.append(
            f"{i},{p['hasindustry']},{p['hasoccupation']},{p['hascompany']},"
            f"{p['hasprodname']},'{t}',{100 if i % 2 else 250},{p['hasproposal']},"
            f"{p['empathies']},x,y,{p['birthyear']},{p['state']},"
            f"{p['gender_raw']},{p['job']},{p['price']}"
        )
    with open(f"{dest}/price.csv", "w", encoding="utf-8") as fp:
        fp.write("\n".join([HEADER] + rows))
    return texts


def run_submit(source_csv: str, out_dir: str, cfg: dict, cores: int) -> dict:
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
            f"{REPO}/scripts/submit_price.py",
            source_csv,
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


def _golden_profile_block(n: int):
    """Pure-python mirror of generate_price's DictVectorizer-style profile
    block: decode fields like the loader (fuman_base.py:17-37 semantics),
    collect categorical domains, alpha-sort 'field=value' + numeric names."""
    import numpy as np

    decoded = []
    for i in range(n):
        p = _profile_fields(i)
        g = p["gender_raw"]
        gender = "unk" if g == "\\0" else {"1": "male", "2": "female"}.get(g, "unk")
        decoded.append(
            {
                "hasindustry": str(p["hasindustry"] == 1),
                "hasoccupation": str(p["hasoccupation"] == 1),
                "hascompany": str(p["hascompany"] == 1),
                "hasprodname": str(p["hasprodname"] == 1),
                "hasproposal": str(p["hasproposal"] == 1),
                "state": p["state"],
                "gender": gender,
                "job": p["job"],
                "empathies": float(p["empathies"]),
                "birthyear": 0.0 if p["birthyear"] == 0 else float(RUN_YEAR - p["birthyear"]),
            }
        )
    cat_cols = ["hasindustry", "hasoccupation", "hascompany", "hasprodname",
                "hasproposal", "state", "gender", "job"]
    num_cols = ["empathies", "birthyear"]
    names = sorted(
        [f"{c}={v}" for c in cat_cols for v in sorted({d[c] for d in decoded})]
        + num_cols
    )
    block = np.zeros((n, len(names)))
    for r, d in enumerate(decoded):
        for j, name in enumerate(names):
            if "=" in name:
                c, v = name.split("=", 1)
                block[r, j] = 1.0 if d[c] == v else 0.0
            else:
                block[r, j] = d[name]
    return block, names


def golden_diff(texts: list[str], out_dir: str, cfg: dict) -> dict:
    """Every written svmlight row must match a golden row: exact label and
    nonzero index signature, allclose values.  Layout (generate_price):
    [ profile one-hot | rant_stats 19 | type BoW | POS BoW | word TF-IDF ]."""
    import numpy as np
    import pandas as pd

    from py_evalfilter_spark import golden
    from py_evalfilter_spark import textcore as tc

    n = len(texts)
    nfkc_texts = [tc.nfkc(t) for t in texts]
    profile, names = _golden_profile_block(n)
    blocks = [profile, golden.golden_rant_stats(pd.Series(nfkc_texts)).to_numpy()]
    t0 = time.perf_counter()
    type_vocab = golden.fit_vocabulary(
        nfkc_texts, tc.tokenize_token_type, ngram_range=(1, cfg.get("type_ngram", 3)),
        min_df=cfg["type_min_df"], max_features=cfg["type_max_features"],
    )
    blocks.append(
        golden.transform_counts(
            nfkc_texts, type_vocab, tc.tokenize_token_type,
            (1, cfg.get("type_ngram", 3)),
        )
    )
    pos_vocab = golden.fit_vocabulary(
        nfkc_texts, tc.tokenize_pos, ngram_range=(1, cfg.get("pos_ngram", 2)),
        min_df=cfg["pos_min_df"], max_features=cfg["pos_max_features"],
    )
    blocks.append(
        golden.transform_counts(
            nfkc_texts, pos_vocab, tc.tokenize_pos, (1, cfg.get("pos_ngram", 2))
        )
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
    labels = [float(_profile_fields(i)["price"]) for i in range(n)]
    golden_sec = round(time.perf_counter() - t0, 2)

    vocab = json.load(open(f"{out_dir}/vocabulary.json"))
    assert len(vocab) == want.shape[1], (len(vocab), want.shape)
    assert vocab[: len(names)] == names, "profile block header mismatch"

    buckets: dict[tuple, list] = {}
    for lab, row in zip(labels, want):
        nz = tuple(np.flatnonzero(row).tolist())
        buckets.setdefault((lab, nz), []).append(row)

    checked = 0
    for fold in sorted(os.listdir(out_dir)):
        if not fold.startswith("price-fold-"):
            continue
        for part in sorted(os.listdir(f"{out_dir}/{fold}")):
            if not part.startswith("part-"):
                continue
            for line in open(f"{out_dir}/{fold}/{part}", encoding="utf-8"):
                toks = line.split()
                lab = float(toks[0])
                idx_val = [t.split(":") for t in toks[1:]]
                nz = tuple(int(i) - 1 for i, _ in idx_val)
                vals = np.array([float(v) for _, v in idx_val])
                cands = buckets.get((lab, nz), [])
                assert cands, f"no golden row with signature (label={lab}, nnz={len(nz)})"
                assert any(
                    np.allclose(vals, c[list(nz)], rtol=1e-7, atol=1e-9) for c in cands
                ), f"values diverge from golden (label={lab})"
                checked += 1
    assert checked == n, (checked, n)
    return {"golden_rows_matched": checked, "golden_rows_total": n,
            "golden_sec": golden_sec}


REFERENCE_CFG = dict(  # generate_dataset_price.py:38-45 click defaults
    type_min_df=10, type_max_features=1000,
    pos_min_df=25, pos_max_features=3000,
    word_min_df=25, word_max_features=0,
)
GOLDEN_CFG = dict(
    type_min_df=5, type_max_features=100,
    pos_min_df=5, pos_max_features=300,
    word_min_df=3, word_max_features=40,  # rant_bow ON
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mode", choices=["bench", "golden"], default="bench")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--work-dir", default="/tmp/price_e2e")
    args = ap.parse_args()

    cfg = REFERENCE_CFG if args.mode == "bench" else GOLDEN_CFG
    limit = args.limit if args.limit else (6000 if args.mode == "golden" else None)
    work = f"{args.work_dir}_{args.mode}"
    shutil.rmtree(work, ignore_errors=True)
    src, out = f"{work}/source", f"{work}/out"

    texts = synth_source(args.sf_dir, src, limit)
    result = run_submit(f"{src}/price.csv", out, cfg, args.cores)
    result.update({"mode": args.mode, "n_source_rows": len(texts), "sf_dir": args.sf_dir})
    if args.mode == "golden":
        result.update(golden_diff(texts, out, cfg))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
