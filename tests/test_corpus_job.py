"""End-to-end curation pipeline job (scripts/corpus_job.py): the composed
LLM-data path — exact dedup -> MinHash near-dup -> text analysis ->
quality/lang filter -> curated parquet + stats line."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_corpus_job_end_to_end(tmp_path):
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "1000", "--output", out_dir, "--cpus", "8",
         "--langs", "en,und"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])

    # planted duplicates: ids 100..900 step 100 are exact copies (9 docs),
    # ids 101..901 step 100 are one-word-changed near dups (9 docs)
    assert stats["stages"]["raw"] == 1000
    assert stats["stages"]["exact_dedup"] == 991
    assert stats["stages"]["near_dedup"] == 982
    assert stats["stages"]["curated"] <= stats["stages"]["near_dedup"]
    assert stats["stages"]["curated"] > 900  # filter must not nuke the corpus

    import pandas as pd

    curated = pd.read_parquet(out_dir)
    assert len(curated) == stats["stages"]["curated"]
    # analysis columns rode through to the curated table
    for col in ("quality", "lang_pred", "n_words", "fingerprint"):
        assert col in curated.columns, col
    assert curated["doc_id"].is_unique
    assert (curated["quality"] >= 0.5).all()


def test_corpus_job_sample_pack_shuffle(tmp_path):
    """Late curation stages: --sample / --pack-budget / --shuffle-seed
    compose after the filter; output is a deterministic function of
    doc_id (verified against the pure-python XXH64 oracle)."""
    out_dir = str(tmp_path / "packed")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "600", "--output", out_dir, "--cpus", "8",
         "--sample", "web=0.4", "--sample-default", "1.0",
         "--pack-budget", "512", "--shuffle-seed", "17"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["stages"]["sampled"] < stats["stages"]["curated"]

    import pandas as pd

    from tests.oracle.xxh64_pure import SPARK_SEED, hash_bytes, hash_int, to_i64

    def h(seed, s):
        return to_i64(hash_bytes(s.encode(), hash_int(seed, SPARK_SEED)))

    out = pd.read_parquet(out_dir)
    assert len(out) == stats["stages"]["sampled"]
    assert {"pack_shard", "pack_id"} <= set(out.columns)
    # sampling oracle: every surviving web row drew u < 0.4 resolution
    web = out[out.source == "web"]
    assert len(web) > 0
    assert all(h(42, d) % 1_000_000 < 400_000 for d in web.doc_id)
    assert (out[out.source != "web"].groupby("source").size() > 0).all()
    # shuffle oracle: rows land in (xxhash64(17, id), id) order per file,
    # and files concatenate to the global order (pandas reads part files
    # in name order = range-partition order)
    keys = [(h(17, d), d) for d in out.doc_id]
    assert keys == sorted(keys)


def test_corpus_job_decontaminate(tmp_path):
    """--decontaminate drops curated docs sharing a 13-gram with the
    benchmark set; the stats line attributes the drops."""
    import pandas as pd

    # benchmark = verbatim copies of two synthetic docs (synth_docs is
    # deterministic, so regenerate their texts here through the job itself
    # by first running WITHOUT decontamination and lifting two texts)
    probe_dir = str(tmp_path / "probe")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "300", "--output", probe_dir, "--cpus", "8"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    docs = pd.read_parquet(probe_dir).sort_values("doc_id")
    bench = docs.iloc[:2][["doc_id", "text"]]
    bench_dir = str(tmp_path / "bench.parquet")
    bench.to_parquet(bench_dir)

    out_dir = str(tmp_path / "clean")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "300", "--output", out_dir, "--cpus", "8",
         "--decontaminate", bench_dir],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["decontaminated"] >= 2
    clean = pd.read_parquet(out_dir)
    assert not set(bench.doc_id) & set(clean.doc_id)
    assert len(clean) == stats["stages"]["curated"] - stats["decontaminated"]


def test_corpus_job_paragraph_and_repetition(tmp_path):
    """--paragraph-dedup and the Gopher repetition caps compose into the
    pipeline: boilerplate paragraphs survive only in their first doc,
    boilerplate-only docs drop at the paragraph stage, a repeated-line spam
    doc is dropped by --max-dup-line-frac, and every stats bucket
    reconciles (no silent caps at either row or paragraph granularity)."""
    import pandas as pd

    BP = "This website uses cookies to improve your experience."
    rows = [
        ("a", f"{BP}\n\nFirst article body with plenty of ordinary words."),
        ("b", f"Second article opening paragraph.\n\n{BP}\n\nSecond closing."),
        ("c", BP),  # boilerplate-only -> dropped at the paragraph stage
        ("d", "Completely unique article about distributed query engines."),
        ("spam", "\n".join(["buy cheap tokens now"] * 9 + ["one honest line"])),
    ]
    in_dir = str(tmp_path / "in")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        in_dir, engine="pyarrow")
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--paragraph-dedup", "--max-dup-line-frac", "0.3",
         "--min-quality", "0.0"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])

    assert stats["stages"]["raw"] == 5
    assert stats["stages"]["exact_dedup"] == 5          # all texts distinct
    assert stats["stages"]["para_dedup"] == 4           # 'c' drops entirely
    # 8 paragraphs total; BP kept once -> its 2 later copies drop
    assert stats["paragraphs_dropped"] == 2
    assert stats["repetition_filtered"] == 1            # the spam doc
    # bucket reconciliation back to the near-dedup stage count
    assert stats["stages"]["near_dedup"] == (
        stats["stages"]["curated"] + stats["quality_filtered"]
        + stats["repetition_filtered"] + stats["lang_filtered"]
    )

    curated = pd.read_parquet(out_dir)
    by_id = dict(zip(curated["doc_id"], curated["text"]))
    assert "spam" not in by_id and "c" not in by_id
    assert by_id["a"].startswith(BP)                    # first occurrence kept
    assert BP not in by_id["b"]
    assert by_id["b"] == "Second article opening paragraph.\n\nSecond closing."
    assert "dup_line_frac" in curated.columns           # signals ride through


def test_corpus_job_redact_pii(tmp_path):
    """--redact-pii scrubs emails/IPs/phones/SSNs/cards to typed tokens
    without dropping rows, and the stats line attributes how many docs and
    matches were touched."""
    import pandas as pd

    rows = [
        ("p1", "Contact alice@example.com or 555-123-4567 for details."),
        ("p2", "Server logs show 192.168.1.1 hitting the endpoint twice."),
        ("p3", "A perfectly clean document about columnar storage formats."),
        ("p4", "ssn 123-45-6789 and card 4111 1111 1111 1111 in one line."),
    ]
    in_dir = str(tmp_path / "in")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        in_dir, engine="pyarrow")
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--redact-pii", "--min-quality", "0.0"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["pii_docs_redacted"] == 3
    assert stats["pii_matches_redacted"] == 5  # p1:2, p2:1, p4:2
    assert stats["stages"]["curated"] == 4  # redaction never drops rows

    by_id = dict(zip(*pd.read_parquet(out_dir)[["doc_id", "text"]].T.values))
    assert by_id["p1"] == "Contact <EMAIL> or <PHONE> for details."
    assert by_id["p2"] == "Server logs show <IP> hitting the endpoint twice."
    assert by_id["p3"] == rows[2][1]  # untouched
    assert by_id["p4"] == "ssn <SSN> and card <CARD> in one line."


def test_corpus_job_url_stages(tmp_path):
    """--block-domains and --url-dedup run ahead of content dedup when the
    input carries a url column, each with its own stage count."""
    import pandas as pd

    rows = [
        ("u1", "Article body one about engines.", "https://www.good.com/a?utm_source=x"),
        ("u2", "Article body two, different text.", "https://good.com/a"),  # canon dup of u1
        ("u3", "Article body three, unique.", "https://good.com/b"),
        ("u4", "Spammy body.", "https://ads.blocked.io/z"),
        ("u5", "No url row.", None),
    ]
    in_dir = str(tmp_path / "in")
    pd.DataFrame(rows, columns=["doc_id", "text", "url"]).to_parquet(
        in_dir, engine="pyarrow")
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--url-dedup", "--block-domains", "blocked.io",
         "--min-quality", "0.0"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["stages"]["raw"] == 5
    assert stats["stages"]["domain_filter"] == 4   # u4 dropped
    assert stats["stages"]["url_dedup"] == 3       # u2 folds into u1; null url rides
    assert stats["stages"]["curated"] == 3

    curated = pd.read_parquet(out_dir)
    assert sorted(curated.doc_id) == ["u1", "u3", "u5"]
    assert "url" in curated.columns


def test_corpus_job_classifier_gate(tmp_path):
    """--clf-weights gates on the hashed linear classifier score with its
    own attribution bucket; the threshold is derived in-test from the
    pure-python oracle so the planted split is exact."""
    import math
    import re

    import pandas as pd

    from tests.oracle.xxh64_pure import SPARK_SEED, hash_bytes, to_i64

    N_BUCKETS = 4096
    wts = {b: ((b * 2654435761) % 2001 - 1000) / 1000.0 for b in range(N_BUCKETS)}

    def score(text):
        cleaned = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
        words = cleaned.split(" ") if cleaned else []
        feats = words + [" ".join(words[i:i + 2]) for i in range(len(words) - 1)]
        hs = [to_i64(hash_bytes(f.encode(), SPARK_SEED)) % N_BUCKETS for f in feats]
        mean = sum(wts[b] for b in hs) / len(hs) if hs else 0.0
        return 1.0 / (1.0 + math.exp(-mean))

    rows = [(f"c{i}", f"document body {i} about engines and curation w{i}")
            for i in range(6)]
    scores = sorted(score(t) for _, t in rows)
    thresh = (scores[2] + scores[3]) / 2  # split 3 keep / 3 drop exactly

    in_dir = str(tmp_path / "in")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(in_dir, engine="pyarrow")
    w_dir = str(tmp_path / "weights")
    pd.DataFrame(
        {"bucket": list(wts), "weight": [wts[b] for b in wts]}
    ).to_parquet(w_dir, engine="pyarrow")
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--clf-weights", w_dir, "--clf-buckets", str(N_BUCKETS),
         "--min-clf-score", str(thresh), "--min-quality", "0.0"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["clf_filtered"] == 3
    assert stats["stages"]["curated"] == 3
    curated = pd.read_parquet(out_dir)
    want = sorted(d for d, t in rows if score(t) >= thresh)
    assert sorted(curated.doc_id) == want
    assert (curated.clf_score >= thresh).all()


def test_corpus_job_span_dedup(tmp_path):
    """--span-dedup removes corpus-wide duplicate word spans (first
    occurrence kept) between the exact and near-dup stages, reporting
    removed-word accounting."""
    import pandas as pd

    block = " ".join(f"boiler{i}" for i in range(6))
    rows = [
        ("s1", f"first article body keeps the block {block} intact here"),
        ("s2", f"second article body where {block} must vanish entirely"),
        ("s3", "third article totally unique wording throughout"),
    ]
    in_dir = str(tmp_path / "in")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(in_dir, engine="pyarrow")
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--span-dedup", "6", "--min-quality", "0.0"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["stages"]["span_dedup"] == 3   # no doc fully covered
    assert stats["span_words_removed"] == 6
    by_id = dict(zip(*pd.read_parquet(out_dir)[["doc_id", "text"]].T.values))
    assert by_id["s1"] == rows[0][1]            # first occurrence verbatim
    assert by_id["s2"] == "second article body where must vanish entirely"
    assert by_id["s3"] == rows[2][1]


def test_corpus_job_html_input(tmp_path):
    """--html-input extracts text from an html column before every other
    stage; downstream dedup/analysis run on the extracted text."""
    import pandas as pd

    page = ("<html><head><script>x()</script></head><body>"
            "<h1>Title A</h1><p>Body text with enough ordinary words here.</p>"
            "</body></html>")
    rows = [
        ("h1", page),
        ("h2", page.replace("Title A", "Title B")),  # differs post-extraction
        ("h3", "<p>" + "Body text with enough ordinary words here.</p>"),
    ]
    in_dir = str(tmp_path / "in")
    pd.DataFrame(rows, columns=["doc_id", "html"]).to_parquet(in_dir, engine="pyarrow")
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--html-input", "--min-quality", "0.0", "--threshold", "0.9"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["stages"]["raw"] == 3
    curated = pd.read_parquet(out_dir)
    by_id = dict(zip(curated.doc_id, curated.text))
    assert by_id["h1"] == "Title A\n\nBody text with enough ordinary words here."
    assert "html" not in curated.columns
    # h3 extracts to a strict subset (no title) — a DIFFERENT exact text,
    # so it survives exact dedup
    assert "h3" in by_id


def test_corpus_job_ppl_gate_and_null_attribution(tmp_path):
    """--max-ppl drops OOV gibberish scored against a held-out reference;
    NULL-text rows (which ride through exact dedup by design) are
    attributed to quality_filtered, so the buckets + curated reconcile to
    near_dedup even with NULLs present."""
    import pandas as pd

    vocab = [f"word{v:02d}" for v in range(20)]
    # held-out reference: every ordered vocab bigram once -> any
    # vocab-word document is fully in-domain for the LM
    ref = [{"text": f"{a} {b}"} for a in vocab for b in vocab]
    ref_dir = str(tmp_path / "ref.parquet")
    pd.DataFrame(ref).to_parquet(ref_dir)

    # in-domain docs: word j of doc i = vocab[(7i + j^2) % 20] — distinct
    # docs share NO 3-gram shingles (j = k mod 10 and i' = i is the only
    # solution), so none of them near-dup together
    rows = [
        {"doc_id": f"d{i:03d}",
         "text": " ".join(vocab[(7 * i + j * j) % 20] for j in range(40))}
        for i in range(20)
    ]
    rows += [
        {"doc_id": f"g{i}", "text": " ".join(f"zq{i}x{j}v" for j in range(40))}
        for i in range(3)
    ]  # every word unseen in the reference -> OOV, huge perplexity
    rows += [{"doc_id": "n0", "text": None}, {"doc_id": "n1", "text": None}]
    in_dir = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows).to_parquet(in_dir)

    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--min-quality", "0.0", "--max-ppl", "10000", "--lm-ref", ref_dir],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])

    # nothing deduped away: 20 in-domain + 3 gibberish + 2 null
    assert stats["stages"]["near_dedup"] == 25
    # NULL quality counts as a quality drop (three-valued-logic regression)
    assert stats["quality_filtered"] == 2
    # all three gibberish docs exceed the cap; in-domain docs survive
    assert stats["ppl_filtered"] == 3
    # full attribution: buckets + curated == near_dedup, nulls included
    assert (
        stats["stages"]["curated"]
        + stats["quality_filtered"]
        + stats["ppl_filtered"]
        + stats["lang_filtered"]
        == stats["stages"]["near_dedup"]
    )
    out = pd.read_parquet(out_dir)
    assert len(out) == stats["stages"]["curated"] == 20
    assert "ppl" in out.columns and (out["ppl"] <= 10000).all()


def test_corpus_job_gopher_rules(tmp_path):
    """--gopher-rules drops rule violators with their own attribution
    bucket, and the buckets still reconcile to near_dedup."""
    import pandas as pd

    prose = ("the quick brown fox jumps over the lazy dog and then it ran "
             "far away to have a rest with friends near the river that "
             "flows beyond the hills while birds sing softly in the trees "
             "and the evening light fades over quiet fields of grain "
             "where farmers walk home slowly after work")  # > 50 words
    rows = [{"doc_id": f"p{i}",
             "text": prose + " " + " ".join(f"extra{i}word{j}" for j in range(15))}
            for i in range(3)]  # unique 15-word tails keep them below the
    # near-dup threshold while the shared prose keeps gopher_pass true
    rows += [{"doc_id": "b0",
              "text": "\n".join(f"- bullet {i} entry listing" for i in range(20))}]
    rows += [{"doc_id": "s0", "text": "way too short with the and of that"}]
    in_dir = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows).to_parquet(in_dir)

    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--min-quality", "0.0", "--threshold", "0.95", "--gopher-rules"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    # b0 (bullet spam, no stopwords, short) and s0 (word count) drop
    assert stats["gopher_filtered"] == 2
    assert (
        stats["stages"]["curated"] + stats["quality_filtered"]
        + stats["gopher_filtered"] + stats["lang_filtered"]
        == stats["stages"]["near_dedup"]
    )
    out = pd.read_parquet(out_dir)
    assert set(out.doc_id) == {"p0", "p1", "p2"}
    assert out.gopher_pass.all()


def test_corpus_job_mix_and_dsir(tmp_path):
    """--mix-alpha (both modes) and --dsir-target/--dsir-k wire into the
    late-stage pipeline: factors are audited in the stats line, epoch
    mode replicates, DSIR selects exactly k curated docs."""
    import pandas as pd

    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    base_dir = str(tmp_path / "base")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "600", "--output", base_dir, "--cpus", "8"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    base = pd.read_parquet(base_dir)

    # downsample mix: factors audited, web (the largest source) thinned,
    # smallest source kept whole
    mix_dir = str(tmp_path / "mixed")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "600", "--output", mix_dir, "--cpus", "8",
         "--mix-alpha", "0.5"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    fac = stats["mix_factors"]
    assert set(fac) == {"web", "books", "code"}
    assert max(fac.values()) == 1.0 and min(fac.values()) < 1.0
    mixed = pd.read_parquet(mix_dir)
    assert stats["stages"]["sampled"] == len(mixed)
    n_base = base["source"].value_counts()
    n_mix = mixed["source"].value_counts()
    small = n_base.idxmin()
    assert n_mix[small] == n_base[small]      # smallest source kept whole
    assert n_mix["web"] < n_base["web"]       # largest source thinned

    # epoch mix replicates small sources and salts the shuffle on epoch
    epoch_dir = str(tmp_path / "epoch")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "600", "--output", epoch_dir, "--cpus", "8",
         "--mix-alpha", "0.5", "--mix-mode", "epoch", "--shuffle-seed", "3"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ep = pd.read_parquet(epoch_dir)
    assert "epoch" in ep.columns
    assert len(ep) > len(base)                # replication grew the corpus
    assert (ep[ep["source"] == "web"].groupby("doc_id").size() == 1).all()

    # DSIR selects exactly k docs, all from the curated population
    dsir_dir = str(tmp_path / "dsir")
    target_dir = str(tmp_path / "target")
    base.head(30)[["doc_id", "text"]].to_parquet(
        os.path.join(tmp_path, "target"), index=False
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "600", "--output", dsir_dir, "--cpus", "8",
         "--dsir-target", target_dir, "--dsir-k", "50"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    sel = pd.read_parquet(dsir_dir)
    assert len(sel) == 50 == stats["stages"]["sampled"]
    assert set(sel["doc_id"]) <= set(base["doc_id"])
    assert "dsir_logw" not in sel.columns and "dsir_key" not in sel.columns

    # --dsir-target without --dsir-k is a usage error, not a silent no-op
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "100", "--output", str(tmp_path / "x"),
         "--cpus", "8", "--dsir-target", target_dir],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode != 0


def test_corpus_job_c4_gates(tmp_path):
    """--c4-clean rewrites docs from compliant lines before any dedup
    (lines removed + docs touched audited) and --c4-rules drops pages in
    its own attribution bucket that reconciles with the stage counts."""
    import pandas as pd

    prose_line = ("The quick brown fox jumps over the lazy dog and then "
                  "runs far away to rest near the quiet river tonight.")
    rows = [
        # three keepers: enough clean sentences, unique tails dodge near-dup
        {"doc_id": f"k{i}",
         "text": "\n".join(
             prose_line.replace("fox", f"fox{i}word{j}") for j in range(4))}
        for i in range(3)
    ]
    # boilerplate doc: one good line + junk lines that --c4-clean strips,
    # leaving < 3 sentences so --c4-rules drops it
    rows += [{"doc_id": "boiler",
              "text": prose_line + "\n"
              "Enable javascript to view this site with all the features.\n"
              "cookies\n"
              "menu home about contact login"}]
    # brace doc: clean lines but a curly brace -> c4_rules drop
    rows += [{"doc_id": "brace",
              "text": "\n".join(
                  prose_line.replace("dog", "dog{" + str(j) + "}")
                  for j in range(4))}]
    in_dir = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows).to_parquet(in_dir)

    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--min-quality", "0.0", "--threshold", "0.95",
         "--c4-clean", "--c4-rules"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    # line clean touched only the boilerplate doc: 3 junk lines removed
    assert stats["c4_docs_cleaned"] == 1
    assert stats["c4_lines_removed"] == 3
    # document rules dropped boiler (1 sentence left) and brace
    assert stats["c4_filtered"] == 2
    assert (
        stats["stages"]["curated"] + stats["quality_filtered"]
        + stats["c4_filtered"] + stats["lang_filtered"]
        == stats["stages"]["near_dedup"]
    )
    out = pd.read_parquet(out_dir)
    assert set(out.doc_id) == {"k0", "k1", "k2"}
    assert out.c4_pass.all()
    # the cleaned text is what got written: no javascript line survives
    assert not out.text.str.contains("javascript").any()


def test_corpus_job_ppl_buckets(tmp_path):
    """--ppl-buckets annotates survivors with the CCNet head/middle/tail
    split; --keep-ppl-buckets drops the rest in its own attribution
    bucket so the stage counts still reconcile."""
    import pandas as pd

    vocab = [f"word{v:02d}" for v in range(20)]
    ref = [{"text": f"{a} {b}"} for a in vocab for b in vocab]
    ref_dir = str(tmp_path / "ref.parquet")
    pd.DataFrame(ref).to_parquet(ref_dir)

    # perplexity gradient: doc i mixes i OOV words into 40-i in-domain
    # words (same no-shared-shingle construction as the ppl-gate test)
    rows = [
        {"doc_id": f"d{i:03d}",
         "text": " ".join(
             (f"zq{i}x{j}v" if j < i else vocab[(7 * i + j * j) % 20])
             for j in range(40))}
        for i in range(18)
    ]
    in_dir = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows).to_parquet(in_dir)

    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")

    # annotate-only: nothing drops, bucket counts audited
    out_dir = str(tmp_path / "annotated")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--min-quality", "0.0", "--ppl-buckets", "--lm-ref", ref_dir],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    out = pd.read_parquet(out_dir)
    assert len(out) == 18 == stats["stages"]["curated"]
    bc = stats["ppl_bucket_counts"]
    assert sum(bc.values()) == 18 and set(bc) <= {"head", "middle", "tail"}
    # the bucket order tracks the perplexity gradient: every head doc has
    # lower ppl than every tail doc
    assert out[out.ppl_bucket == "head"].ppl.max() \
        < out[out.ppl_bucket == "tail"].ppl.min()

    # keep head+middle (the CCNet training choice): tail drops, attributed
    keep_dir = str(tmp_path / "kept")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", keep_dir, "--cpus", "8",
         "--min-quality", "0.0", "--ppl-buckets", "--lm-ref", ref_dir,
         "--keep-ppl-buckets", "head,middle"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    kept = pd.read_parquet(keep_dir)
    assert set(kept.ppl_bucket) == {"head", "middle"}
    assert stats["ppl_bucket_filtered"] == stats["ppl_bucket_counts"].get(
        "tail", 0) > 0
    assert len(kept) + stats["ppl_bucket_filtered"] == 18

    # --ppl-buckets without --lm-ref is a usage error
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", str(tmp_path / "x"),
         "--cpus", "8", "--ppl-buckets"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode != 0


def test_corpus_job_normalize(tmp_path):
    """--normalize canonicalizes unicode BEFORE dedup, so two docs that
    differ only by zero-width chars / NFD accents / CRLF become exact
    duplicates and collapse; the stats line reports docs changed."""
    import pandas as pd
    import unicodedata

    body = "café body text with enough ordinary words here."
    rows = [
        ("n1", body),
        # same text, NFD accents + a ZWSP + CRLF tail — exact-dup only
        # after normalization
        ("n2", unicodedata.normalize("NFD", body).replace(
            "body", "bo​dy") + "\r\n"),
        ("n3", "a genuinely different document with its own words."),
    ]
    in_dir = str(tmp_path / "in")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        in_dir, engine="pyarrow")
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--normalize", "--min-quality", "0.0", "--threshold", "0.9"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["stages"]["raw"] == 3
    assert stats["normalize_docs_changed"] == 1  # only n2 changes
    # n2 normalized to exactly n1's text + trailing newline-less body?
    # CRLF -> LF leaves a trailing \n, so texts differ... verify directly:
    curated = pd.read_parquet(out_dir)
    by_id = dict(zip(curated.doc_id, curated.text))
    assert by_id.get("n2", by_id.get("n1")) is not None
    # without trailing whitespace they are byte-equal post-normalization
    texts = {d: t.rstrip("\n") for d, t in by_id.items()}
    vals = list(texts.values())
    assert body in vals


def test_corpus_job_normalize_collapses_dups(tmp_path):
    """The sharper check: with identical post-normalization bytes the
    pair MUST collapse in exact dedup (1 survivor), and without
    --normalize it must NOT."""
    import pandas as pd
    import unicodedata

    body = "café body text with enough ordinary words here."
    rows = [
        ("n1", body),
        ("n2", unicodedata.normalize("NFD", body).replace(
            "body", "bo​dy")),  # no CRLF: normalizes to body exactly
        ("n3", "a genuinely different document with its own words."),
    ]
    in_dir = str(tmp_path / "in")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        in_dir, engine="pyarrow")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    for flag, want_exact in ((["--normalize"], 2), ([], 3)):
        out_dir = str(tmp_path / ("c" + str(want_exact)))
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
             "--input", in_dir, "--output", out_dir, "--cpus", "8",
             *flag, "--min-quality", "0.0", "--threshold", "0.9"],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        stats = json.loads(
            [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
        assert stats["stages"]["exact_dedup"] == want_exact, (flag, stats)


def test_train_then_gate_pipeline(tmp_path):
    """The full classifier loop: scripts/train_classifier.py trains the
    hashed-NB model on a labeled corpus, then corpus_job gates on the
    written weights + printed bias — spam-shaped docs drop, prose stays."""
    import pandas as pd

    labeled = (
        [(f"p{i}", f"quality essay prose chapter {i % 7} insight", 1)
         for i in range(40)]
        + [(f"s{i}", f"viagra casino {i % 7} winner click prize", 0)
           for i in range(40)]
    )
    lab_dir = str(tmp_path / "labeled")
    pd.DataFrame(labeled, columns=["doc_id", "text", "label"]).to_parquet(
        lab_dir, engine="pyarrow")
    w_dir = str(tmp_path / "weights")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_classifier.py"),
         "--labeled", lab_dir, "--output", w_dir, "--cpus", "8"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    model = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert model["buckets_learned"] > 0
    assert model["labeled_rows"] == 80

    # held-out corpus: 3 prose docs + 2 spam docs, no exact/near dups
    corpus = [
        ("h0", "an essay of insight and prose entirely new material"),
        ("h1", "chapter discussing quality insight through careful prose"),
        ("h2", "prose with insight on essay structure and chapter flow"),
        ("x0", "casino prize click winner jackpot tonight now"),
        ("x1", "winner winner casino click prize claim immediately"),
    ]
    in_dir = str(tmp_path / "docs")
    pd.DataFrame(corpus, columns=["doc_id", "text"]).to_parquet(
        in_dir, engine="pyarrow")
    out_dir = str(tmp_path / "curated")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", in_dir, "--output", out_dir, "--cpus", "8",
         "--clf-weights", w_dir, "--clf-bias", str(model["bias"]),
         "--min-clf-score", "0.5", "--min-quality", "0.0",
         "--threshold", "0.9"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["clf_filtered"] == 2, stats
    curated = pd.read_parquet(out_dir)
    assert sorted(curated.doc_id) == ["h0", "h1", "h2"]


def test_corpus_job_tokenize(tmp_path):
    """--vocab-size turns the curated text corpus into the engine's
    native pre-tokenized table: tokens/n_tok columns, a committed vocab
    table, OOV audit, and packing measured in true tokens."""
    import pandas as pd

    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--synthetic-docs", "400", "--output", out_dir, "--cpus", "8",
         "--vocab-size", "300", "--pack-budget", "256",
         "--min-quality", "0.0"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["vocab_size"] == 300
    assert stats["tokens_written"] > 0
    assert 0.0 < stats["oov_rate"] < 1.0  # 500-word synth vocab > 300 kept

    curated = pd.read_parquet(out_dir)
    vocab = pd.read_parquet(out_dir + "_vocab")
    assert len(vocab) == 300
    assert sorted(vocab.id) == list(range(2, 302))
    # every doc ends in eos=1; n_tok counts the real array; unk=0 present
    assert (curated.tokens.map(lambda t: t[-1]) == 1).all()
    assert (curated.tokens.map(len) == curated.n_tok).all()
    # packs exist and were budgeted on n_tok: concat-then-chunk assigns a
    # doc to the pack where its cumulative span begins, so a pack sum may
    # overshoot the budget by strictly less than one doc — but never by
    # a whitespace-count artifact (the pre-tokenize proxy measured ~40
    # words/doc while true n_tok is 41 with eos)
    assert "pack_id" in curated.columns
    by_pack = curated.groupby(["pack_shard", "pack_id"]).n_tok.sum()
    assert (by_pack <= 256 + int(curated.n_tok.max()) - 1).all()
    assert (by_pack > 0).all()
    # stats tokens_written reconciles with the table
    assert stats["tokens_written"] == int(curated.n_tok.sum())
