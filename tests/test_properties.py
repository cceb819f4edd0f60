"""Property-based tests (hypothesis): Spark operators vs pure-Python
reference semantics on randomized inputs. Few examples (Spark jobs are
~0.5 s each) but each example exercises shapes hand-written cases miss —
duplicate timestamps across inputs, exact-gap boundaries, singleton and
empty partitions."""

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


@st.composite
def _offset_lists(draw):
    """1-3 keys, each with 1-25 strictly increasing second-offsets."""
    n_keys = draw(st.integers(1, 3))
    out = {}
    for k in range(n_keys):
        gaps = draw(st.lists(st.integers(1, 2000), min_size=1, max_size=25))
        offs, acc = [], 0
        for g in gaps:
            acc += g
            offs.append(acc)
        out[str(k)] = offs
    return out


@settings(max_examples=8, deadline=None)
@given(data=_offset_lists(), gap=st.integers(60, 900))
def test_sessionize_matches_python_reference(spark, data, gap):
    from spark_timeseries_spark.operators.sessionize import sessionize

    rows = [
        (k, BASE + dt.timedelta(seconds=s), float(i))
        for k, offs in data.items()
        for i, s in enumerate(offs)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    got = {
        (r.key, r.ts): r.session_id
        for r in sessionize(df, float(gap)).collect()
    }
    for k, offs in data.items():
        sid = 0
        for i, s in enumerate(offs):
            if i > 0 and s - offs[i - 1] > gap:
                sid += 1
            assert got[(k, BASE + dt.timedelta(seconds=s))] == sid, (k, s, gap)


@settings(max_examples=8, deadline=None)
@given(
    a=st.lists(st.integers(0, 500), min_size=1, max_size=40),
    b=st.lists(st.integers(0, 500), min_size=1, max_size=40),
)
def test_union_index_df_matches_sorted_distinct(spark, a, b):
    from spark_timeseries_spark.operators.align import union_index_df

    mk = lambda xs: spark.createDataFrame(
        [(BASE + dt.timedelta(minutes=x),) for x in xs], "ts timestamp"
    )
    rows = union_index_df(mk(a), mk(b)).orderBy("loc").collect()
    want = sorted({BASE + dt.timedelta(minutes=x) for x in a + b})
    assert [r.ts for r in rows] == want
    assert [r.loc for r in rows] == list(range(len(want)))


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 10_000),            # doc_id (may collide; dedup below)
            st.sampled_from(["a", "b", "c"]),  # stratum
            st.integers(0, 30),                # n whitespace tokens
        ),
        min_size=1,
        max_size=60,
    ),
    seq_len=st.integers(2, 64),
)
def test_pack_sequences_matches_python_prefix_sum(spark, docs, seq_len):
    """Packing invariant under random corpora: offsets are EXACTLY the
    prefix sums of (tokens + sep) in (stratum, id) order — i.e. the
    distributed bucket-cumsum plan reproduces the sequential layout a
    single-threaded packer would produce, for any id distribution
    (clustered, sparse, colliding buckets) and any seq_len."""
    from spark_timeseries_spark.pipeline.packing import pack_sequences

    uniq = {(i, s): n for i, s, n in docs}          # one row per (id, stratum)
    uniq = {
        i: (s, n)
        for (i, s), n in sorted(uniq.items())       # and one stratum per id
    }
    rows = [(i, s, "w " * n) for i, (s, n) in uniq.items()]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: r
        for r in pack_sequences(
            df, seq_len=seq_len, sep_tokens=1, bpe=False, n_buckets=5
        ).collect()
    }
    run = 0
    for i, (s, n) in sorted(uniq.items(), key=lambda kv: (kv[1][0], kv[0])):
        r = got[i]
        assert r.offset == run, (i, r.offset, run)
        assert r.n_tokens == n
        assert r.seq_id == run // seq_len
        if n > 0:  # last OWN token sits at offset + n - 1 (separator
            # excluded — counting it spanned a phantom sequence for docs
            # ending exactly on a boundary); empty docs span 0 sequences
            want = (run + n - 1) // seq_len - run // seq_len + 1
        else:
            want = 0
        assert r.n_seqs_spanned == want, (i, r.n_seqs_spanned, want)
        run += n + 1


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 4),
)
def test_remove_dup_spans_matches_python_reference(spark, docs, n):
    """remove_dup_spans(keep_first=False) against a brute-force reference:
    mark every token position covered by an n-gram occurring in ≥2 distinct
    docs, keep the rest."""
    from spark_timeseries_spark.pipeline.dedup import remove_dup_spans

    corpus = [(i, " ".join(toks)) for i, toks in enumerate(docs)]

    # brute force over the token lists
    from collections import defaultdict

    where = defaultdict(set)
    for i, toks in enumerate(docs):
        for s in range(len(toks) - n + 1):
            where[tuple(toks[s:s + n])].add(i)
    expected = {}
    for i, toks in enumerate(docs):
        cut = set()
        for s in range(len(toks) - n + 1):
            if len(where[tuple(toks[s:s + n])]) >= 2:
                cut.update(range(s, s + n))
        kept = [t for p, t in enumerate(toks) if p not in cut]
        expected[i] = (" ".join(kept), len(toks), len(cut))

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.removed_tokens)
        for r in remove_dup_spans(df, n=n, keep_first=False).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.floats(0.0, 3.0, allow_nan=False, width=16),
        max_size=3,
    ),
    seed=st.integers(0, 5),
)
def test_mixture_epochs_matches_exact_hash_reference(spark, weights, seed):
    """In md5_60 mode every copy decision is exactly computable in plain
    Python: n = floor(w) + (md5-bucket < frac(w)·1e6)."""
    import hashlib

    from spark_timeseries_spark.pipeline.sampling import mixture_epochs

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r.doc_id, r.epoch)
        for r in mixture_epochs(
            df, weights, seed=seed, hash_fn="md5_60"
        ).collect()
    )

    def bucket(i):
        h = hashlib.md5(f"{i}\x02epoch\x01{seed}".encode()).hexdigest()[:15]
        return int(h, 16) % 1_000_000

    expected = []
    for i, src in rows:
        w = weights.get(src, 1.0)
        n = int(w) + (1 if bucket(i) < int(round((w - int(w)) * 1_000_000))
                      else 0)
        expected.extend((i, e) for e in range(n))
    assert got == sorted(expected)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    ),
    max_size=st.integers(1, 8),
    min_count=st.integers(1, 3),
)
def test_build_vocab_matches_python_reference(spark, docs, max_size, min_count):
    from collections import Counter

    from spark_timeseries_spark.pipeline.vocab import build_vocab

    corpus = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [(r.token_id, r.token, r.cnt)
           for r in build_vocab(df, max_size, min_count).collect()]

    counts = Counter(t for toks in docs for t in toks)
    ranked = sorted(
        ((t, c) for t, c in counts.items() if c >= min_count),
        key=lambda tc: (-tc[1], tc[0]),
    )[:max_size]
    assert got == [(i, t, c) for i, (t, c) in enumerate(ranked)]


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["pa", "pb", "pc", "pd"]),
                 min_size=0, max_size=5),
        min_size=1,
        max_size=6,
    ),
)
def test_dedup_paragraphs_matches_python_reference(spark, docs):
    """Keep-first paragraph dedup against a brute-force reference over
    random corpora built from a tiny paragraph alphabet (maximizing
    collisions, intra-doc repeats, and empty docs)."""
    from spark_timeseries_spark.pipeline.dedup import dedup_paragraphs

    corpus = [(i, "\n\n".join(ps)) for i, ps in enumerate(docs)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_paras, r.removed_paras)
           for r in dedup_paragraphs(df).collect()}

    seen = set()
    expected = {}
    for i, ps in enumerate(docs):
        kept = []
        for p in ps:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        expected[i] = ("\n\n".join(kept), len(ps), len(ps) - len(kept))
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "c", "ab"]), min_size=1,
                  max_size=12),
    pair=st.sampled_from([("a", "b"), ("a", "a"), ("b", "c"), ("ab", "c")]),
)
def test_bpe_merge_fold_matches_python_reference(spark, syms, pair):
    """merge_fold_expr == the leftmost-first single-pass greedy merge (the
    classic BPE merge semantics): after a merge the new symbol does NOT
    immediately re-merge with the following symbol in the same pass."""
    from spark_timeseries_spark.pipeline.bpe import merge_fold_expr

    a, b = pair

    def py_fold(xs):
        out = []
        just_merged = False
        for x in xs:
            if out and not just_merged and out[-1] == a and x == b:
                out[-1] = a + b
                just_merged = True
            else:
                out.append(x)
                just_merged = False
        return out

    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(merge_fold_expr(F.col("syms"), a, b).alias("m")).first().m
    assert got == py_fold(syms), (syms, pair, got)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["red line", "blue line", "green line",
                                  "unique %d"]), min_size=0, max_size=5),
        min_size=1, max_size=6,
    ),
    min_docs=st.integers(2, 3),
    keep_first=st.booleans(),
)
def test_dedup_lines_matches_python_reference(spark, docs, min_docs,
                                              keep_first):
    """dedup_lines == brute-force python: a line in >= min_docs distinct
    docs keeps only its corpus-first occurrence (or none), others keep
    every occurrence."""
    from spark_timeseries_spark.pipeline.dedup import dedup_lines

    texts = []
    for i, lines in enumerate(docs):
        texts.append((i, "\n".join(
            ln % i if "%d" in ln else ln for ln in lines)))
    df = spark.createDataFrame(texts, "doc_id long, text string")

    # python reference
    occ = []
    for i, text in texts:
        for j, ln in enumerate(
                s.strip() for s in text.split("\n") if s.strip()):
            occ.append((i, j, ln))
    from collections import defaultdict
    by_line = defaultdict(set)
    for i, j, ln in occ:
        by_line[ln].add(i)
    firsts = {}
    for i, j, ln in sorted(occ):
        firsts.setdefault(ln, (i, j))
    want = {}
    for i, text in texts:
        kept = []
        for j, ln in enumerate(
                s.strip() for s in text.split("\n") if s.strip()):
            dup = len(by_line[ln]) >= min_docs
            if not dup or (keep_first and firsts[ln] == (i, j)):
                kept.append(ln)
        want[i] = "\n".join(kept)

    got = {r.doc_id: r.text for r in
           dedup_lines(df, min_docs=min_docs, keep_first=keep_first)
           .collect()}
    assert got == want, (texts, min_docs, keep_first)


@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 30), st.floats(-100, 100)),
        min_size=2, max_size=15, unique_by=lambda t: t[0],
    )
)
def test_theil_sen_matches_python_reference(spark, data):
    """Theil-Sen on randomized (loc, value) sets == the numpy median of
    pairwise slopes / residual median, including interpolated medians on
    even pair counts."""
    import numpy as np

    from spark_timeseries_spark.operators.cusum import theil_sen

    rows = [("k", int(l), float(v)) for l, v in data]
    df = spark.createDataFrame(rows, "key string, loc long, value double")
    got = theil_sen(df).collect()[0]
    xs = np.array([l for l, _ in data], dtype=float)
    ys = np.array([v for _, v in data], dtype=float)
    slopes = [(ys[j] - ys[i]) / (xs[j] - xs[i])
              for i in range(len(xs)) for j in range(len(xs)) if xs[i] < xs[j]]
    want_slope = float(np.median(slopes))
    want_icpt = float(np.median(ys - want_slope * xs))
    assert abs(got.slope - want_slope) < 1e-9, data
    assert abs(got.intercept - want_icpt) < 1e-9, data


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                 min_size=0, max_size=12),
        min_size=2, max_size=5,
    )
)
def test_containment_matches_python_sets(spark, docs):
    """ngram_containment_pairs (count-based) == brute-force python set
    algebra over distinct 2-gram shingles on randomized corpora."""
    from spark_timeseries_spark.pipeline.dedup import ngram_containment_pairs

    texts = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r
           for r in ngram_containment_pairs(df, shingle_n=2,
                                            threshold=0.0).collect()}

    def sh(ws):
        return {" ".join(ws[i:i+2]) for i in range(len(ws) - 1)}
    sets = {i: sh(ws) for i, ws in enumerate(docs)}
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] & sets[b]:
                inter = len(sets[a] & sets[b])
                want[(a, b)] = (inter / len(sets[a]), inter / len(sets[b]),
                                inter / len(sets[a] | sets[b]))
    assert set(got) == set(want), docs
    for k, (ca, cb, j) in want.items():
        r = got[k]
        assert abs(r.containment_a - ca) < 1e-12
        assert abs(r.containment_b - cb) < 1e-12
        assert abs(r.jaccard - j) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=0.5, max_value=1000.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=3, max_size=40,
    )
)
def test_risk_ratios_identities(spark, vals):
    """On any positive value series with at least one loss:
    omega == gain_to_pain + 1 exactly (sum r = gain - pain), max_dd in
    [0, 1), calmar = mean_ret/max_dd; with no losses omega/g2p/calmar
    are NULL and max_dd == 0."""
    import numpy as np

    from spark_timeseries_spark.operators.indicators import risk_ratios

    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "key string, loc long, value double",
    )
    rows = risk_ratios(df).collect()
    if not rows:
        return
    r = rows[0]
    rets = np.diff(vals) / np.array(vals[:-1])
    has_loss = (rets < 0).any()
    if has_loss:
        assert r.omega is not None
        assert abs(r.omega - (r.gain_to_pain + 1.0)) < 1e-9
        assert 0.0 < r.max_dd < 1.0
        assert abs(r.calmar - r.mean_ret / r.max_dd) < 1e-9
    else:
        assert r.omega is None and r.gain_to_pain is None
        assert r.max_dd == 0.0 and r.calmar is None


@settings(max_examples=8, deadline=None)
@given(
    perm=st.permutations(list(range(1, 6))),
    extra=st.lists(st.integers(100, 200), max_size=3, unique=True),
)
def test_ndcg_bounds_and_perfect(spark, perm, extra):
    """NDCG is in [0, 1] for ANY approximate ordering over the exact
    top-5 (plus junk items); the identity ordering scores exactly 1;
    junk-only retrieval scores 0."""
    from spark_timeseries_spark.pipeline.similarity import ndcg_at_k

    exact = spark.createDataFrame(
        [("q", i, i) for i in range(1, 6)],
        "qid string, vec_id long, rank int",
    )
    approx_rows = [("q", item, pos + 1) for pos, item in enumerate(perm)]
    approx = spark.createDataFrame(
        approx_rows, "qid string, vec_id long, rank int")
    r = ndcg_at_k(exact, approx, k=5).collect()[0]
    assert -1e-12 <= r.ndcg <= 1.0 + 1e-12
    assert r.hits == 5
    if perm == [1, 2, 3, 4, 5]:
        assert abs(r.ndcg - 1.0) < 1e-12
    junk = spark.createDataFrame(
        [("q", 100 + i, i + 1) for i in range(5)],
        "qid string, vec_id long, rank int")
    r0 = ndcg_at_k(exact, junk, k=5).collect()[0]
    assert r0.ndcg == 0.0 and r0.hits == 0


@settings(max_examples=6, deadline=None)
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1, max_size=25,
    )
)
def test_pagerank_invariants(spark, edges):
    """On any undirected graph: every pr_int is positive, total mass
    stays in (0.9, 1 + eps] (floor-division leak only shrinks it), and
    symmetric nodes (same neighborhoods) get identical scores."""
    from spark_timeseries_spark.pipeline.graph import pagerank

    pairs = spark.createDataFrame(
        sorted(edges), "id_a long, id_b long")
    rows = pagerank(pairs, iters=4).collect()
    assert rows
    tot = sum(r.pr_int for r in rows) / 1e6
    assert 0.9 < tot <= 1.0 + 1e-9
    assert all(r.pr_int > 0 for r in rows)
    # degree-1 nodes attached to the same hub are interchangeable
    import collections
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    sig = collections.defaultdict(list)
    got = {r.id: r.pr_int for r in rows}
    for node, nb in adj.items():
        sig[frozenset(nb)].append(node)
    for group in sig.values():
        prs = {got[n] for n in group}
        assert len(prs) == 1, group


@settings(max_examples=6, deadline=None)
@given(
    coeffs=st.lists(
        st.floats(min_value=-3, max_value=3,
                  allow_nan=False, allow_infinity=False),
        min_size=3, max_size=3,
    )
)
def test_savgol_reproduces_quadratics(spark, coeffs):
    """A Savitzky-Golay filter of polyorder 2 reproduces ANY quadratic
    exactly on the interior (the defining property of the filter)."""
    from spark_timeseries_spark.operators.smoothing import savgol_smooth

    a, b, c = coeffs
    y = [a * t * t + b * t + c for t in range(25)]
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(y)],
        "key string, loc long, value double",
    )
    for r in savgol_smooth(df, 7, 2).collect():
        if r.savgol is not None:
            assert abs(r.savgol - y[r.loc]) < 1e-7 * max(1.0, abs(y[r.loc]))


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=50,
                  allow_nan=False, allow_infinity=False),
        min_size=2, max_size=60,
    )
)
def test_msprt_always_valid_shape(spark, vals):
    """For ANY value stream: p_always is in (0, 1], monotone
    non-increasing in n, and reject_05 is exactly p <= 0.05."""
    from spark_timeseries_spark.operators.experiment import msprt

    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "key string, ts int, value double",
    )
    rows = sorted(
        msprt(df, tau2=1.0, mu0=0.0, order_col="ts").collect(),
        key=lambda r: r.ts,
    )
    ps = [r.p_always for r in rows]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(a >= b - 1e-15 for a, b in zip(ps, ps[1:]))
    for r in rows:
        assert r.reject_05 == (r.p_always <= 0.05)


@settings(max_examples=8, deadline=None)
@given(
    scores=st.lists(
        st.tuples(st.integers(0, 8), st.booleans()),
        min_size=4, max_size=40,
    ).filter(lambda xs: any(l for _, l in xs) and any(not l for _, l in xs)),
)
def test_roc_auc_properties(spark, scores):
    """AUC in [0, 1]; invariant under any strictly monotone transform
    of the score; complemented by label flip (AUC_flipped = 1 - AUC)."""
    from spark_timeseries_spark.pipeline.classifier import roc_auc

    rows = [(float(s), int(l)) for s, l in scores]
    df = spark.createDataFrame(rows, "score double, label int")
    a = roc_auc(df, "score", "label").collect()[0]
    assert 0.0 <= a.auc <= 1.0
    # strictly monotone transform: 3x + 1 (order-preserving, tie-preserving)
    mono = df.select(
        (F.col("score") * 3.0 + 1.0).alias("score"), "label")
    b = roc_auc(mono, "score", "label").collect()[0]
    assert abs(a.auc - b.auc) < 1e-12
    flip = df.select("score", (1 - F.col("label")).alias("label"))
    c = roc_auc(flip, "score", "label").collect()[0]
    assert abs((a.auc + c.auc) - 1.0) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    durs=st.lists(
        st.tuples(st.integers(1, 30), st.booleans()),
        min_size=2, max_size=40,
    ),
    tau=st.integers(2, 40),
)
def test_rmst_cif_mass_properties(spark, durs, tau):
    """rmst in (0, tau]; equals tau when nothing ever dies;
    cumulative_incidence curves are nondecreasing and
    sum_k CIF_k(T) + S(T) == 1 (Aalen-Johansen mass identity)."""
    from spark_timeseries_spark.operators.survival import (
        cumulative_incidence,
        kaplan_meier,
        rmst,
    )

    rows = [(d, int(e)) for d, e in durs]
    df = spark.createDataFrame(rows, "duration long, event int")
    r = rmst(df, tau=float(tau)).collect()[0]
    assert 0.0 < r.rmst <= tau + 1e-9
    cens = df.select("duration", F.lit(0).alias("event"))
    assert abs(rmst(cens, tau=float(tau)).collect()[0].rmst - tau) < 1e-9

    # competing risks: cause = 1/2 split by duration parity for events
    cr = df.select(
        "duration",
        F.when(F.col("event") == 0, 0)
        .otherwise(F.pmod(F.col("duration"), F.lit(2)) + 1)
        .alias("cause"),
    )
    rows_cif = cumulative_incidence(cr).orderBy("cause", "duration").collect()
    by_cause = {}
    for row in rows_cif:
        seq = by_cause.setdefault(row.cause, [])
        if seq:
            assert row.cif >= seq[-1] - 1e-12  # nondecreasing
        seq.append(row.cif)
    if by_cause:
        km = kaplan_meier(
            cr.select("duration", (F.col("cause") > 0).cast("int").alias("event"))
        ).orderBy("duration").collect()
        s_last = km[-1].survival
        total = sum(seq[-1] for seq in by_cause.values()) + s_last
        assert abs(total - 1.0) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    diffs=st.lists(
        st.integers(-6, 6), min_size=2, max_size=40
    ).filter(lambda xs: any(x != 0 for x in xs)),
)
def test_wilcoxon_antisymmetry(spark, diffs):
    """Negating every difference swaps W+/W- and negates z; W+ + W-
    equals n(n+1)/2 over the nonzero diffs."""
    from spark_timeseries_spark.operators.hypothesis import wilcoxon_signed

    df = spark.createDataFrame([(float(d),) for d in diffs], "diff double")
    a = wilcoxon_signed(df).collect()[0]
    neg = df.select((-F.col("diff")).alias("diff"))
    b = wilcoxon_signed(neg).collect()[0]
    assert abs(a.w_plus - b.w_minus) < 1e-9
    assert abs(a.w_minus - b.w_plus) < 1e-9
    assert abs(a.w_plus + a.w_minus - a.n * (a.n + 1) / 2.0) < 1e-9
    if a.z is not None:
        assert abs(a.z + b.z) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    cells=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=5, max_size=60,
    ).filter(
        lambda xs: len({a for a, _ in xs}) > 1 and len({b for _, b in xs}) > 1
    ),
)
def test_cramers_v_bounds(spark, cells):
    """V and corrected V in [0, 1]; chi2 >= 0; a duplicated table
    (every row twice) keeps V identical (scale invariance of the
    association measure) while chi2 doubles."""
    from spark_timeseries_spark.operators.hypothesis import cramers_v

    rows = [(str(a), str(b)) for a, b in cells]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.chi2 >= -1e-9
    assert 0.0 - 1e-12 <= r.v <= 1.0 + 1e-9
    assert 0.0 - 1e-12 <= r.v_corrected <= 1.0 + 1e-9
    dup = spark.createDataFrame(rows + rows, "a string, b string")
    r2 = cramers_v(dup, "a", "b").collect()[0]
    assert abs(r2.v - r.v) < 1e-9
    assert abs(r2.chi2 - 2.0 * r.chi2) < 1e-6


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=3, max_size=40,
    ),
)
def test_brier_decomposition_identity(spark, pts):
    """Brier score in [0, 1] for in-range forecasts; the Murphy
    decomposition BS = REL - RES + UNC is an exact identity; every
    component is within its bounds; a perfect forecast scores 0."""
    from spark_timeseries_spark.pipeline.classifier import brier

    rows = [(s / 10.0, int(l)) for s, l in pts]
    df = spark.createDataFrame(rows, "score double, label int")
    b = brier(df, "score", "label").collect()[0]
    assert 0.0 <= b.brier <= 1.0 + 1e-12
    assert abs(b.brier - (b.reliability - b.resolution + b.uncertainty)) < 1e-12
    assert b.reliability >= -1e-12
    assert b.resolution >= -1e-12
    assert -1e-12 <= b.uncertainty <= 0.25 + 1e-12
    perfect = df.select(
        F.col("label").cast("double").alias("score"), "label")
    p = brier(perfect, "score", "label").collect()[0]
    assert abs(p.brier) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    scores=st.lists(
        st.tuples(st.integers(0, 8), st.booleans()),
        min_size=4, max_size=40,
    ).filter(lambda xs: any(l for _, l in xs)),
)
def test_average_precision_properties(spark, scores):
    """AP in (0, 1]; invariant under any strictly monotone transform
    of the score; exactly 1 when every positive strictly outscores
    every negative."""
    from spark_timeseries_spark.pipeline.classifier import (
        average_precision,
    )

    rows = [(float(s), int(l)) for s, l in scores]
    df = spark.createDataFrame(rows, "score double, label int")
    a = average_precision(df, "score", "label").collect()[0]
    assert 0.0 < a.ap <= 1.0 + 1e-12
    mono = df.select(
        (F.col("score") * 3.0 + 1.0).alias("score"), "label")
    b = average_precision(mono, "score", "label").collect()[0]
    assert abs(a.ap - b.ap) < 1e-12
    # separable ranking: positives at score+100 -> AP exactly 1
    sep = df.select(
        (F.col("score") + F.col("label") * 100.0).alias("score"), "label")
    c = average_precision(sep, "score", "label").collect()[0]
    assert abs(c.ap - 1.0) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    subj=st.lists(
        st.tuples(
            st.integers(1, 12), st.booleans(), st.integers(0, 5)
        ),
        min_size=3, max_size=40,
    ).filter(lambda xs: any(e for _, e, _ in xs)),
)
def test_concordance_index_properties(spark, subj):
    """C in [0, 1]; negating the risk complements it exactly
    (concordant and discordant swap, ties stay); C is invariant under
    a strictly monotone risk transform; a risk that perfectly
    anti-orders distinct uncensored durations scores 1."""
    from spark_timeseries_spark.operators.survival import (
        concordance_index,
    )

    rows = [(float(t), int(e), float(r)) for t, e, r in subj]
    df = spark.createDataFrame(
        rows, "duration double, event int, risk double")
    a = concordance_index(df).collect()[0]
    if a.comparable == 0:
        return
    assert 0.0 <= a.c_index <= 1.0 + 1e-12
    neg = df.select("duration", "event", (-F.col("risk")).alias("risk"))
    b = concordance_index(neg).collect()[0]
    assert b.comparable == a.comparable
    assert b.tied_risk == a.tied_risk
    assert abs(a.c_index + b.c_index - 1.0) < 1e-12
    mono = df.select(
        "duration", "event", (F.col("risk") * 2.0 + 5.0).alias("risk"))
    c = concordance_index(mono).collect()[0]
    assert c.concordant == a.concordant and c.comparable == a.comparable
    # perfect model on distinct uncensored durations
    dd = [(float(t), 1, -float(t)) for t, _, _ in subj]
    dd = [(t, e, r) for t, e, r in dict.fromkeys(dd)]
    if len({t for t, _, _ in dd}) == len(dd) and len(dd) >= 2:
        pdf = spark.createDataFrame(
            dd, "duration double, event int, risk double")
        p = concordance_index(pdf).collect()[0]
        assert abs(p.c_index - 1.0) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=3, max_size=40,
    ),
)
def test_log_loss_classification_report_properties(spark, pts):
    """log_loss >= 0, ~0 for a perfect confident forecast, and
    symmetric under (p, y) -> (1-p, 1-y); classification_report cells
    partition n, accuracy = (tp+tn)/n, f1 is the harmonic mean."""
    from spark_timeseries_spark.pipeline.classifier import (
        classification_report,
        log_loss,
    )

    rows = [(s / 10.0, int(l)) for s, l in pts]
    df = spark.createDataFrame(rows, "score double, label int")
    a = log_loss(df, "score", "label").collect()[0]
    assert a.log_loss >= -1e-12
    # symmetry holds exactly only away from the clip boundary (1-(1-eps)
    # is not eps in doubles), so test it on interior scores
    interior = df.select(
        (F.col("score") * 0.8 + 0.1).alias("score"), "label")
    ai = log_loss(interior, "score", "label").collect()[0]
    flip = interior.select(
        (1.0 - F.col("score")).alias("score"),
        (1 - F.col("label")).alias("label"),
    )
    b = log_loss(flip, "score", "label").collect()[0]
    assert abs(ai.log_loss - b.log_loss) < 1e-9
    perfect = df.select(
        F.col("label").cast("double").alias("score"), "label")
    p = log_loss(perfect, "score", "label").collect()[0]
    assert abs(p.log_loss) < 1e-9

    r = classification_report(df, "score", "label", threshold=0.5)
    r = r.collect()[0]
    assert r.tp + r.fp + r.tn + r.fn == r.n
    assert abs(r.accuracy - (r.tp + r.tn) / r.n) < 1e-12
    if r.f1 is not None:
        prec = r.tp / (r.tp + r.fp)
        rec = r.tp / (r.tp + r.fn)
        assert abs(r.f1 - 2 * prec * rec / (prec + rec)) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    scores=st.lists(
        st.tuples(st.integers(0, 30), st.booleans()),
        min_size=10, max_size=60,
    ).filter(lambda xs: any(l for _, l in xs)),
)
def test_lift_table_properties(spark, scores):
    """Buckets partition the rows; cum_n/cum_pos/gain are nondecreasing
    in bucket order; the final bucket has gain = 1 and lift = 1."""
    from spark_timeseries_spark.pipeline.classifier import lift_table

    rows = [(float(s), int(l)) for s, l in scores]
    df = spark.createDataFrame(rows, "score double, label int")
    tbl = sorted(
        lift_table(df, "score", "label").collect(),
        key=lambda r: r.bucket,
    )
    assert sum(r.n for r in tbl) == len(rows)
    assert sum(r.n_pos for r in tbl) == sum(l for _, l in scores)
    for a, b in zip(tbl, tbl[1:]):
        assert b.cum_n > a.cum_n and b.cum_pos >= a.cum_pos
        assert b.gain >= a.gain - 1e-12
    last = tbl[-1]
    assert last.cum_n == len(rows)
    assert abs(last.gain - 1.0) < 1e-12
    assert abs(last.lift - 1.0) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("abd")),
        min_size=4, max_size=60,
    ),
)
def test_g_test_kappa_properties(spark, pairs):
    """G >= 0 and symmetric in argument order; kappa = 1 on perfect
    agreement, po/pe are probabilities, and kappa <= 1 always."""
    from spark_timeseries_spark.operators.hypothesis import (
        cohen_kappa,
        g_test,
    )

    df = spark.createDataFrame(list(pairs), "a string, b string")
    g1 = g_test(df, "a", "b").collect()[0]
    g2 = g_test(df, "b", "a").collect()[0]
    assert g1.g >= -1e-9
    assert abs(g1.g - g2.g) < 1e-9
    assert (g1.r, g1.c) == (g2.c, g2.r)

    k = cohen_kappa(df, "a", "b").collect()[0]
    # pe = sum_k pA(k)*pB(k) is legitimately 0 when the raters' category
    # supports are disjoint (e.g. A always 'a', B always 'b')
    assert 0.0 <= k.po <= 1.0 and 0.0 <= k.pe <= 1.0
    if k.kappa is not None:
        assert k.kappa <= 1.0 + 1e-12
    same = df.select("a", F.col("a").alias("b"))
    ks = cohen_kappa(same, "a", "b").collect()[0]
    if ks.kappa is not None:
        assert abs(ks.kappa - 1.0) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 4), st.booleans()),
        min_size=6, max_size=60,
    ),
)
def test_cochran_armitage_properties(spark, pts):
    """Antisymmetric under dose reversal (z flips sign); invariant
    under a positive affine dose transform; chi2 = z^2."""
    from spark_timeseries_spark.operators.hypothesis import (
        cochran_armitage,
    )

    rows = [(float(s), int(l)) for s, l in pts]
    df = spark.createDataFrame(rows, "score double, label int")
    a = cochran_armitage(df).collect()[0]
    if a.z is None:
        return
    rev = df.select((4.0 - F.col("score")).alias("score"), "label")
    b = cochran_armitage(rev).collect()[0]
    assert abs(a.z + b.z) < 1e-9
    aff = df.select((F.col("score") * 3.0 + 7.0).alias("score"), "label")
    c = cochran_armitage(aff).collect()[0]
    assert abs(a.z - c.z) < 1e-9
    assert abs(a.chi2 - a.z * a.z) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 4)),
        min_size=4, max_size=50,
    ),
)
def test_kendall_tau_b_properties(spark, pts):
    """tau_b in [-1, 1]; antisymmetric under y negation (concordant
    and discordant swap); invariant under strictly increasing
    transforms of either margin; tau_b(x, x) = 1 when x varies."""
    from spark_timeseries_spark.operators.hypothesis import kendall_tau_b

    rows = [(float(x), float(y)) for x, y in pts]
    df = spark.createDataFrame(rows, "x double, y double")
    a = kendall_tau_b(df).collect()[0]
    if a.tau_b is None:
        return
    assert -1.0 - 1e-12 <= a.tau_b <= 1.0 + 1e-12
    neg = df.select("x", (-F.col("y")).alias("y"))
    b = kendall_tau_b(neg).collect()[0]
    assert b.concordant == a.discordant and b.discordant == a.concordant
    assert abs(a.tau_b + b.tau_b) < 1e-12
    mono = df.select(
        (F.col("x") * 2.0 + 1.0).alias("x"),
        (F.col("y") * 3.0 - 4.0).alias("y"),
    )
    c = kendall_tau_b(mono).collect()[0]
    assert c.concordant == a.concordant and c.discordant == a.discordant
    self_df = df.select("x", F.col("x").alias("y"))
    s = kendall_tau_b(self_df).collect()[0]
    if s.tau_b is not None:
        assert abs(s.tau_b - 1.0) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    a=st.lists(st.integers(-10, 10), min_size=2, max_size=30),
    b=st.lists(st.integers(-10, 10), min_size=2, max_size=30),
)
def test_energy_distance_properties(spark, a, b):
    """energy >= 0; exactly 0 (and e_stat 0) when the two samples are
    identical multisets; symmetric in group order."""
    from spark_timeseries_spark.operators.hypothesis import (
        energy_distance,
    )

    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "group string, value double")
    e = energy_distance(df).collect()[0]
    assert e.energy >= -1e-9
    sym_rows = [("b", float(v)) for v in a] + [("a", float(v)) for v in b]
    sdf = spark.createDataFrame(sym_rows, "group string, value double")
    es = energy_distance(sdf).collect()[0]
    assert abs(e.energy - es.energy) < 1e-9
    assert abs(e.e_xy - es.e_xy) < 1e-9
    same = spark.createDataFrame(
        [("a", float(v)) for v in a] + [("b", float(v)) for v in a],
        "group string, value double",
    )
    z = energy_distance(same).collect()[0]
    assert abs(z.energy) < 1e-9 and abs(z.e_stat) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(-20, 20)),
        min_size=4, max_size=50,
    ).filter(lambda xs: len({g for g, _ in xs}) >= 2),
)
def test_anova_oneway_properties(spark, pts):
    """SSB + SSW equals the total sum of squares; F and eta_sq are
    nonnegative; location shift of every value leaves SSB/SSW/F
    unchanged."""
    from spark_timeseries_spark.operators.hypothesis import anova_oneway

    rows = [(g, float(v)) for g, v in pts]
    df = spark.createDataFrame(rows, "group string, value double")
    a = anova_oneway(df).collect()[0]
    vals = [v for _, v in rows]
    gm = sum(vals) / len(vals)
    sst = sum((v - gm) ** 2 for v in vals)
    assert abs((a.ss_between + a.ss_within) - sst) < 1e-6 * max(1, sst)
    assert a.ss_between >= -1e-9 and a.ss_within >= -1e-9
    if a.f_stat is not None:
        assert a.f_stat >= -1e-12
    assert 0.0 - 1e-12 <= (a.eta_sq or 0.0) <= 1.0 + 1e-12
    shifted = df.select("group", (F.col("value") + 100.0).alias("value"))
    s = anova_oneway(shifted).collect()[0]
    assert abs(a.ss_between - s.ss_between) < 1e-6
    assert abs(a.ss_within - s.ss_within) < 1e-6


@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("abde")),
        min_size=4, max_size=60,
    ),
)
def test_theil_u_properties(spark, pairs):
    """U(a|b) and U(b|a) lie in [0, 1]; MI <= min(H_a, H_b);
    U(a|b) = 1 when a is a function of b; MI is symmetric in
    argument order."""
    from spark_timeseries_spark.operators.hypothesis import theil_u

    df = spark.createDataFrame(list(pairs), "a string, b string")
    t = theil_u(df, "a", "b").collect()[0]
    assert t.mi >= -1e-9
    assert t.mi <= min(t.h_a, t.h_b) + 1e-9
    for u in (t.u_a_given_b, t.u_b_given_a):
        if u is not None:
            assert -1e-9 <= u <= 1.0 + 1e-9
    t2 = theil_u(df, "b", "a").collect()[0]
    assert abs(t.mi - t2.mi) < 1e-9
    det = df.select(F.upper(F.col("b")).alias("a"), "b")
    td = theil_u(det, "a", "b").collect()[0]
    if td.u_a_given_b is not None:
        assert abs(td.u_a_given_b - 1.0) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    a=st.lists(st.integers(-8, 8), min_size=2, max_size=30),
    b=st.lists(st.integers(-8, 8), min_size=2, max_size=30),
)
def test_hellinger_properties(spark, a, b):
    """H in [0, 1]; 0 for identical distributions; 1 exactly on
    disjoint supports (bhattacharyya NULL there); symmetric in group
    order."""
    from spark_timeseries_spark.pipeline.drift import hellinger

    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "group string, value double")
    h = hellinger(df).collect()[0]
    assert -1e-12 <= h.hellinger <= 1.0 + 1e-12
    sym = spark.createDataFrame(
        [("b", float(v)) for v in a] + [("a", float(v)) for v in b],
        "group string, value double",
    )
    hs = hellinger(sym).collect()[0]
    assert abs(h.hellinger - hs.hellinger) < 1e-12
    same = spark.createDataFrame(
        [("a", float(v)) for v in a] + [("b", float(v)) for v in a],
        "group string, value double",
    )
    hz = hellinger(same).collect()[0]
    assert abs(hz.hellinger) < 1e-7
    disj = spark.createDataFrame(
        [("a", float(v)) for v in a]
        + [("b", float(v) + 100.0) for v in b],
        "group string, value double",
    )
    hd = hellinger(disj).collect()[0]
    assert abs(hd.hellinger - 1.0) < 1e-12
    assert hd.bhattacharyya is None


@settings(max_examples=8, deadline=None)
@given(
    triples=st.lists(
        st.tuples(
            st.integers(-10, 10), st.integers(-10, 10),
            st.integers(-10, 10),
        ),
        min_size=4, max_size=40,
    ),
)
def test_partial_corr_properties(spark, triples):
    """All four correlations lie in [-1, 1]; partialling out a
    CONSTANT-independent z leaves r_xy unchanged; r(x, x, z) partial
    is 1 where defined."""
    from spark_timeseries_spark.operators.hypothesis import partial_corr

    rows = [(float(x), float(y), float(z)) for x, y, z in triples]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = partial_corr(df).collect()[0]
    for c in (r.r_xy, r.r_xz, r.r_yz, r.r_partial):
        if c is not None:
            assert -1.0 - 1e-9 <= c <= 1.0 + 1e-9
    selfd = df.select("x", F.col("x").alias("y"), "z")
    rs = partial_corr(selfd).collect()[0]
    if rs.r_partial is not None:
        assert abs(rs.r_partial - 1.0) < 1e-6
