"""Property-based parity for the scale operators added late in round 1:

- interval_join (bucketized prefilter) == naive cross-join containment,
  under randomized points/intervals/bucket widths — the prefilter must be
  lossless for ANY bucket width, including widths far from the interval
  lengths;
- rollup cascade == direct aggregation, under randomized tick sets —
  open/close/min/max/count must compose exactly through any cascade depth.
"""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.rangejoin import interval_join
from binance_futures_data_lake_spark.operators.resample import rollup_bars, tick_ohlcv

T0 = dt.datetime(2024, 1, 1)
SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def interval_case(draw):
    points = draw(
        st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=30)
    )
    n_iv = draw(st.integers(min_value=0, max_value=10))
    ivs = []
    for _ in range(n_iv):
        a = draw(st.integers(min_value=0, max_value=3000))
        ln = draw(st.integers(min_value=0, max_value=600))
        ivs.append((a, a + ln))
    bucket = draw(st.sampled_from(["15 minutes", "1 hours", "6 hours", "1 days"]))
    return points, ivs, bucket


@SETTINGS
@given(case=interval_case())
def test_interval_join_lossless_for_any_bucket(spark, case):
    points, ivs, bucket = case
    pdf = spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m)) for i, m in enumerate(points)],
        "pid long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [(j, T0 + dt.timedelta(minutes=a), T0 + dt.timedelta(minutes=b))
         for j, (a, b) in enumerate(ivs)],
        "ivid long, start timestamp, end timestamp",
    )
    got = {
        (r.pid, r.ivid)
        for r in interval_join(pdf, idf, "ts", "start", "end", bucket=bucket).collect()
    }
    want = {
        (i, j)
        for i, m in enumerate(points)
        for j, (a, b) in enumerate(ivs)
        if a <= m <= b
    }
    assert got == want


@st.composite
def tick_case(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    ticks = [
        (
            i,
            draw(st.integers(min_value=0, max_value=4 * 1440)),  # minutes over 4 days
            draw(st.integers(min_value=-1000, max_value=1000)),
        )
        for i in range(n)
    ]
    return ticks


@SETTINGS
@given(ticks=tick_case())
def test_cascade_equals_direct(spark, ticks):
    df = spark.createDataFrame(
        [(i, "k", T0 + dt.timedelta(minutes=m), float(v)) for i, m, v in ticks],
        "event_id long, key string, ts timestamp, value double",
    )
    m5 = tick_ohlcv(df, 5, ["key"], tiebreak_col="event_id")
    d_cascade = rollup_bars(rollup_bars(m5, 60, ["key"]), 1440, ["key"])
    d_direct = tick_ohlcv(df, 1440, ["key"], tiebreak_col="event_id")
    a = {r.bucket_ts: r for r in d_cascade.collect()}
    b = {r.bucket_ts: r for r in d_direct.collect()}
    assert a.keys() == b.keys()
    for k in a:
        for col in ("open", "high", "low", "close", "n_ticks", "first_ts", "last_ts"):
            assert getattr(a[k], col) == getattr(b[k], col), (k, col)
        # integer-valued doubles: sums are exact, so volume must match exactly
        assert a[k].volume == b[k].volume


@st.composite
def corpus_case(draw):
    vocab = ["aa", "bb", "cc", "dd", "ee"]  # tiny vocab forces shared spans
    n_docs = draw(st.integers(min_value=1, max_value=6))
    docs = []
    for i in range(n_docs):
        toks = draw(
            st.lists(st.sampled_from(vocab), min_size=0, max_size=15)
        )
        shard = draw(st.sampled_from(["s0", "s1"]))
        docs.append((i, " ".join(toks), shard))
    return docs


@SETTINGS
@given(docs=corpus_case(), budget=st.sampled_from([3, 5, 8]))
def test_pack_sequences_equals_bruteforce(spark, docs, budget):
    from binance_futures_data_lake_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    got = {
        (r.shard, r.doc_id, r.seq_id): (r.seq_offset, r.tok_start, r.tok_len)
        for r in pack_sequences(df, budget).collect()
    }
    # brute force: walk each shard's concatenated token stream position by
    # position, assigning every token to (seq, offset) and re-deriving the
    # per-(doc, seq) segments
    want = {}
    for shard in sorted({s for _, _, s in docs}):
        stream = 0
        for did, text, s in sorted(docs):
            if s != shard:
                continue
            toks = [t for t in text.split() if t]
            for j in range(len(toks)):
                seq, off = divmod(stream + j, budget)
                key = (shard, did, seq)
                if key not in want:
                    want[key] = (off, j, 0)
                want[key] = (want[key][0], want[key][1], want[key][2] + 1)
            stream += len(toks)
    assert got == want


@SETTINGS
@given(docs=corpus_case(), k=st.sampled_from([2, 3]))
def test_scrub_spans_equals_bruteforce(spark, docs, k):
    from binance_futures_data_lake_spark.operators.textquality import (
        scrub_cross_doc_spans,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in scrub_cross_doc_spans(df, span_tokens=k, min_docs=2).collect()
    }
    toks = {d: [t for t in text.split() if t] for d, text, _ in docs}
    span_docs = {}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            span_docs.setdefault(tuple(ts[i : i + k]), set()).add(d)
    shared = {sp: min(ds) for sp, ds in span_docs.items() if len(ds) >= 2}
    want = {}
    for d, ts in toks.items():
        if not ts:
            continue  # 0-token docs emit no rows (no positions exist)
        covered = [False] * len(ts)
        for i in range(len(ts) - k + 1):
            sp = tuple(ts[i : i + k])
            if sp in shared and shared[sp] != d:
                for j in range(i, i + k):
                    covered[j] = True
        kept = [t for t, c in zip(ts, covered) if not c]
        want[d] = (len(ts), sum(covered), " ".join(kept))
    assert got == want
