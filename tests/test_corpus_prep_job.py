"""End-to-end corpus-preparation job: funnel correctness on a corpus crafted
so every stage actually cuts rows."""

import sys


def test_corpus_prep_job_funnel(spark, tmp_path, monkeypatch, capsys):
    import jobs.corpus_prep_job as job

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    alt = "one two three four five six seven eight nine ten " * 4
    rows = []
    # per source: 3 docs sharing the `base` body, 3 sharing `alt`
    for s in range(2):
        for i in range(3):
            rows.append((s * 100 + i, f"doc{s}{i} " + base + f"tail{s}{i}",
                         "en", f"src{s}"))
        for i in range(3, 6):
            rows.append((s * 100 + i, f"doc{s}{i} " + alt + f"tail{s}{i}",
                         "en", f"src{s}"))
    rows.append((900, "tiny doc", "en", "src0"))             # fails min-tokens
    rows.append((901, "same line here\n" * 12, "en", "src0"))  # dup-line gate
    rows.append((902, rows[0][1], "en", "src1"))             # exact dup of doc 0
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    # eval set = one base-family doc: decontamination must drop exactly the
    # base family (they all contain verbatim 13-token windows of `base`)
    evp = str(tmp_path / "eval")
    docs.where("doc_id = 101").write.parquet(evp)
    out = str(tmp_path / "chunks")

    monkeypatch.setattr(sys, "argv", [
        "corpus_prep_job.py", "--input", src, "--eval", evp, "--output", out,
        "--chunk-tokens", "16", "--overlap", "4", "--budget-tokens", "60",
        "--min-tokens", "5", "--max-dup-char-pct", "30",
        "--jaccard-threshold", "0.99", "--near-dedup", "exact",
    ])
    assert job.main() == 0
    funnel = {}
    for line in capsys.readouterr().out.splitlines():
        if line.startswith("# corpus_prep"):
            parts = line.split()
            funnel[parts[2].rstrip(":")] = int(parts[3])

    assert funnel["input"] == 15
    # min-tokens drops 900; the dup-line gate drops 901
    assert funnel["quality"] == 13
    # exact dedup drops 902 (byte-clone of doc 0); near-dedup at 0.99
    # distinct-token jaccard merges nothing (each doc has unique doc/tail
    # tokens, so jaccard < 0.99)
    assert funnel["dedup"] == 12
    # the 6 base-family docs are contaminated against the eval doc; the 6
    # alt-family docs survive
    assert funnel["decontaminated"] == 6
    # alt docs are ~42 tokens each: budget 60/source keeps the first two of
    # each source's rank order (cum-before 0 and ~42 < 60), drops the third
    assert funnel["sampled"] == 4
    chunks = spark.read.parquet(out)
    assert {"doc_id", "chunk_idx", "token_start", "n_tokens",
            "chunk_text"} <= set(chunks.columns)
    assert funnel["chunks"] == chunks.count() > 0


def test_corpus_prep_job_c4_and_pii_stages(spark, tmp_path, monkeypatch, capsys):
    """--c4 runs the line/page rules as stage 0 and the PII scrub rewrites
    chunk text (The-Stack ordering: last transform before chunking)."""
    import jobs.corpus_prep_job as job

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    # 6 distinct kept lines (identical lines would trip the dup-line gate)
    prose = "\n".join(
        " ".join(words[i:i + 10]) + "." for i in range(0, 11, 2)
    )
    rows = [
        (0, prose + "\nreach me at a@b.co today.", "en", "src0"),
        (1, "no structure at all here", "en", "src0"),  # no terminal punct -> dropped
        (2, prose.replace(".", ""), "en", "src0"),      # all lines fail -> dropped
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    evp = str(tmp_path / "eval")
    docs.where("doc_id = 2").write.parquet(evp)  # dropped pre-decontamination
    out = str(tmp_path / "chunks")

    monkeypatch.setattr(sys, "argv", [
        "corpus_prep_job.py", "--input", src, "--eval", evp, "--output", out,
        "--chunk-tokens", "16", "--overlap", "0", "--budget-tokens", "1000",
        "--min-tokens", "5", "--jaccard-threshold", "0.99", "--near-dedup", "exact", "--c4",
    ])
    assert job.main() == 0
    funnel = {}
    for ln in capsys.readouterr().out.splitlines():
        if ln.startswith("# corpus_prep"):
            parts = ln.split()
            funnel[parts[2].rstrip(":")] = int(parts[3])
    assert funnel["input"] == 3
    assert funnel["c4_clean"] == 1
    assert funnel["chunks"] > 0
    chunks = spark.read.parquet(out)
    joined = " ".join(r["chunk_text"] for r in
                      chunks.orderBy("chunk_idx").collect())
    assert "<EMAIL>" in joined and "a@b.co" not in joined


def test_corpus_prep_job_gopher_stage(spark, tmp_path, monkeypatch, capsys):
    """--gopher folds the Gopher §A1.1 document rules into the quality stage:
    a doc passing min-tokens but failing the 50-word floor is cut there."""
    import sys

    import jobs.corpus_prep_job as job

    good = (" ".join(
        ["the quick brown fox jumps over that lazy dog with steady grace"] * 5
    ) + ".")
    rows = [
        (0, "doc zero " + good, "en", "src0"),
        (1, "doc one " + good, "en", "src0"),
        # 20 words: passes --min-tokens 5, fails Gopher bit 0 (< 50 words)
        (2, "the and that with " + " ".join(f"word{i}" for i in range(16)),
         "en", "src0"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    evp = str(tmp_path / "eval")
    # eval doc shares no 13-gram window with the corpus
    spark.createDataFrame(
        [(9, " ".join(f"ev{i}" for i in range(30)), "en", "srcE")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(evp)
    out = str(tmp_path / "chunks")

    monkeypatch.setattr(sys, "argv", [
        "corpus_prep_job.py", "--input", src, "--eval", evp, "--output", out,
        "--chunk-tokens", "32", "--overlap", "0", "--budget-tokens", "100000",
        "--min-tokens", "5", "--jaccard-threshold", "0.99", "--near-dedup", "exact", "--gopher",
    ])
    assert job.main() == 0
    funnel = {}
    for ln in capsys.readouterr().out.splitlines():
        if ln.startswith("# corpus_prep"):
            parts = ln.split()
            funnel[parts[2].rstrip(":")] = int(parts[3])
    assert funnel["input"] == 3
    assert funnel["quality"] == 2  # doc 2 fails the Gopher word-count rule
    assert funnel["decontaminated"] == 2
    assert funnel["chunks"] > 0


def test_corpus_prep_job_minhash_near_dedup(spark, tmp_path, monkeypatch, capsys):
    """Default --near-dedup minhash: a near-identical clone (one word changed)
    is merged by the banded LSH + exact-verify path and only the smallest id
    survives; an unrelated doc is untouched."""
    import sys

    import jobs.corpus_prep_job as job

    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
    rows = [
        (0, base, "en", "src0"),
        (1, base.replace("alpha7", "alphaX", 1), "en", "src0"),  # near-dup of 0
        (2, " ".join(f"zeta{i} eta{i}" for i in range(40)), "en", "src0"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    evp = str(tmp_path / "eval")
    spark.createDataFrame(
        [(9, " ".join(f"ev{i}" for i in range(30)), "en", "srcE")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(evp)
    out = str(tmp_path / "chunks")

    monkeypatch.setattr(sys, "argv", [
        "corpus_prep_job.py", "--input", src, "--eval", evp, "--output", out,
        "--chunk-tokens", "64", "--overlap", "0", "--budget-tokens", "100000",
        "--min-tokens", "5", "--jaccard-threshold", "0.5",
    ])
    assert job.main() == 0
    funnel = {}
    for ln in capsys.readouterr().out.splitlines():
        if ln.startswith("# corpus_prep"):
            parts = ln.split()
            funnel[parts[2].rstrip(":")] = int(parts[3])
    assert funnel["input"] == 3
    assert funnel["dedup"] == 2  # doc 1 merged into doc 0's cluster
    chunks = spark.read.parquet(out)
    kept_ids = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    assert kept_ids == {0, 2}
