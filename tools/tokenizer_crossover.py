"""Measure the tokenizer literal-vs-automaton crossover at production
dictionary sizes (round-11 verdict task 4).

Round 10 shipped two scale twins — rank-heap BPE encode and
Aho-Corasick dictionary tagging — whose demo-size numbers LOSE to the
literal codegen forms (BENCH_NOTES r10: 7.28 s vs 0.75 s at 8 merges;
2.96 s vs 0.08 s at 10 terms, the expected Arrow-overhead inversion)
while the "unusable at 30k" claim for the literal forms was argued,
not measured. This harness converts the claim to evidence: both
variants at 10/1k/10k dictionary terms (AC) and 8/1k/30k merge rules
(BPE) over the sf1 documents corpus, dictionaries derived
deterministically FROM that corpus (top words by frequency; BPE rules
as per-word merge chains, valid ordered by construction).

Each (variant, size) measurement runs in its OWN subprocess under a
wall-clock budget: the literal chained-replace plan at 30k rules is
EXPECTED to die in Catalyst analysis (a ~1.5 MB nested expression) or
time out — that failure is the result, and a subprocess records it
instead of hanging the harness. Where both variants complete, the
harness cross-checks their aggregate token counts (the heap/automaton
twins are exact replacements, fuzz-proven in
tests/test_tokenizer_twins.py; this asserts it at corpus scale too).

Usage:
  python tools/tokenizer_crossover.py                  # full sweep ->
      tools/tokenizer_crossover_r11.json
  python tools/tokenizer_crossover.py run EXP SIZE     # one cell
      (EXP in {bpe_literal, bpe_heap, ac_literal, ac_auto})
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".benchdata", "sf1"))
BUDGET_S = int(os.environ.get("SPARK_GRAFT_XOVER_BUDGET", "300"))
AC_SIZES = (10, 1000, 10000)
BPE_SIZES = (8, 1000, 30000)
N_RUNS = 3


def _top_words(spark, limit: int) -> list[str]:
    """Deterministic dictionary source: most frequent [a-z]{3,} words
    of the corpus, ties broken alphabetically."""
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.session import load_tables

    t = load_tables(spark, SF_DIR)
    rows = (
        t["documents"]
        .select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]{3,}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w"))
        .limit(limit)
        .collect()
    )
    return [r["w"] for r in rows]


def _synth_words(n: int) -> list[str]:
    """Deterministic pseudo-words ('zq' + base-26 suffix) that never
    occur in the corpus. Production dictionaries are mostly like
    this: a 10k-term taxonomy or a 30k-merge vocab overwhelmingly
    contains entries absent from any single document — and the
    literal forms pay per ENTRY (one regexp scan / one replace() per
    rule) whether or not it matches, which is exactly the asymmetry
    the crossover measures. The corpus's own top words stay at the
    head of every dictionary so the hot entries are real."""
    out = []
    for i in range(n):
        s, x = "", i
        for _ in range(4):
            s += chr(ord("a") + x % 26)
            x //= 26
        out.append("zq" + s)
    return out


def _merge_chains(words: list[str], n_rules: int) -> tuple:
    """A valid-ordered merge table: for each word, the left-to-right
    merge chain ('h','e'),('he','l'),('hel','l'),... — every composite
    is created before (or at the first occurrence preceding) any use,
    so _validate_merge_order accepts the table by construction."""
    rules: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    for w in words:
        acc = w[0]
        for ch in w[1:]:
            pair = (acc, ch)
            if pair not in seen:
                seen.add(pair)
                rules.append(pair)
                if len(rules) == n_rules:
                    return tuple(rules)
            acc += ch
    return tuple(rules)


def _bpe_literal_df(spark, merges: tuple):
    """The registry's chained-replace form generalized to an arbitrary
    merge table (plans/queries_mlprep.text_bpe_encode with _BPE_MERGES
    swapped): one codegen replace() per rule."""
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.session import load_tables

    expr = "concat(' ', rtrim(regexp_replace(w, '(.)', '$1 ')), ' ')"
    for a, b in merges:
        expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
    n_tok = f"length({expr}) - length(replace({expr}, ' ', '')) - 1"
    docs = load_tables(spark, SF_DIR)["documents"]
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w"),
    )
    return (
        words.select("doc_id", F.expr(n_tok).alias("n_tok"))
        .groupBy("doc_id")
        .agg(F.sum("n_tok").alias("n_tokens_bpe"))
    )


def _bpe_heap_df(spark, merges: tuple):
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.operators.text_analysis import (
        bpe_encode_ranked,
    )
    from data_pipeline_001_spark.session import load_tables

    docs = load_tables(spark, SF_DIR)["documents"]
    return bpe_encode_ranked(docs, merges).select(
        "doc_id", F.col("n_tokens_bpe")
    )


def _ac_literal_df(spark, terms: list[str]):
    """The registry's filter-HOF form (one regexp_like per term) over
    an arbitrary dictionary."""
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.session import load_tables

    kw = F.array(*[F.lit(k) for k in terms])
    tags = F.filter(
        kw,
        lambda k: F.regexp_like(
            F.lower(F.col("text")),
            F.concat(F.lit("\\b"), k, F.lit("\\b")),
        ),
    )
    return load_tables(spark, SF_DIR)["documents"].select(
        "doc_id", F.size(tags).alias("n_tags")
    )


def _ac_auto_df(spark, terms: list[str]):
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.operators.text_analysis import (
        keyword_tags_aho_corasick,
    )
    from data_pipeline_001_spark.session import load_tables

    docs = load_tables(spark, SF_DIR)["documents"]
    return keyword_tags_aho_corasick(docs, tuple(terms)).select(
        "doc_id", "n_tags"
    )


def run_cell(exp: str, size: int) -> None:
    """One measurement in this process: best-of-N_RUNS to the noop
    sink, plus the SUM of the per-doc counts for cross-variant
    equality. Prints one JSON line."""
    from data_pipeline_001_spark.session import get_spark

    spark = get_spark(app_name=f"xover_{exp}_{size}")
    spark.sparkContext.setLogLevel("ERROR")

    if exp.startswith("bpe"):
        # corpus chains first (hot rules are real), synthetic chains
        # fill out to production size (see _synth_words)
        words = _top_words(spark, 12000) + _synth_words(size)
        merges = _merge_chains(words, size)
        assert len(merges) == size, (len(merges), size)
        df = (_bpe_literal_df if exp == "bpe_literal" else _bpe_heap_df)(
            spark, merges
        )
        sum_col = "n_tokens_bpe"
    else:
        terms = _top_words(spark, size)
        terms += _synth_words(size - len(terms))
        assert len(terms) == size
        df = (_ac_literal_df if exp == "ac_literal" else _ac_auto_df)(
            spark, terms
        )
        sum_col = "n_tags"

    from pyspark.sql import functions as F

    runs = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(round(time.perf_counter() - t0, 2))
    checksum = df.agg(F.sum(sum_col)).collect()[0][0]
    print(
        json.dumps(
            {
                "exp": exp,
                "size": size,
                "runs": runs,
                "best": min(runs),
                "checksum": int(checksum),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run_cell(sys.argv[2], int(sys.argv[3]))
        return

    cells = [("bpe_literal", s) for s in BPE_SIZES]
    cells += [("bpe_heap", s) for s in BPE_SIZES]
    cells += [("ac_literal", s) for s in AC_SIZES]
    cells += [("ac_auto", s) for s in AC_SIZES]

    out: dict = {"sf_dir": SF_DIR, "budget_s": BUDGET_S, "cells": []}
    for exp, size in cells:
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run", exp, str(size)],
                capture_output=True,
                text=True,
                timeout=BUDGET_S,
                cwd=REPO,
            )
            line = next(
                (
                    ln
                    for ln in proc.stdout.splitlines()
                    if ln.startswith("{")
                ),
                None,
            )
            if proc.returncode == 0 and line:
                cell = json.loads(line)
            else:
                tail = (proc.stderr or proc.stdout).strip().splitlines()[-8:]
                cell = {
                    "exp": exp,
                    "size": size,
                    "error": " | ".join(tail)[-400:],
                    "wall_s": round(time.perf_counter() - t0, 1),
                }
        except subprocess.TimeoutExpired:
            cell = {
                "exp": exp,
                "size": size,
                "timeout_s": BUDGET_S,
            }
        out["cells"].append(cell)
        print(json.dumps(cell), flush=True)

    # exactness cross-check where both variants completed
    sums: dict = {}
    for c in out["cells"]:
        if "checksum" in c:
            fam = "bpe" if c["exp"].startswith("bpe") else "ac"
            sums.setdefault((fam, c["size"]), {})[c["exp"]] = c["checksum"]
    mismatches = [
        k for k, v in sums.items() if len(v) == 2 and len(set(v.values())) != 1
    ]
    out["checksum_mismatches"] = [list(k) for k in mismatches]
    path = os.path.join(REPO, "tools", "tokenizer_crossover_r11.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
