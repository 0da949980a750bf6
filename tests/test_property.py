"""Property-based tests (hypothesis): proto wire encoder and tick
semantics hold for arbitrary inputs, not just the fixture lines."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from oanda_stream_processor_spark.proto import wire
from tests.test_proto import decode_fields, read_varint

prices = st.one_of(
    st.just(""),
    st.from_regex(r"[0-9]{1,5}\.[0-9]{1,6}", fullmatch=True),
    st.just("N/A"))
liquidity = st.integers(min_value=0, max_value=2**63 - 1)
texts = st.text(alphabet=st.characters(codec="utf-8",
                                       exclude_characters="\x00"),
                max_size=40)


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip_any_u64(n):
    v, i = read_varint(wire._varint(n), 0)
    assert v == n and i == len(wire._varint(n))


@given(prices, liquidity)
def test_price_level_roundtrip(price, liq):
    fields = decode_fields(wire.encode_price_level(price, liq))
    got = {f: v for f, _, v in fields}
    # proto3 omits defaults: absent field == default value
    assert got.get(1, b"").decode() == price
    assert got.get(2, 0) == liq


@settings(max_examples=50)
@given(st.lists(st.tuples(prices, liquidity), max_size=5),
       st.lists(st.tuples(prices, liquidity), max_size=5),
       prices, prices, texts, texts,
       st.integers(min_value=0, max_value=2**32), st.integers(0, 999_999_999))
def test_price_tick_structure(asks, bids, ca, cb, instr, status, secs, nanos):
    b = wire.encode_price_tick(asks, bids, ca, cb, instr, status, secs, nanos)
    by_field: dict[int, list] = {}
    for f, _, v in decode_fields(b):
        by_field.setdefault(f, []).append(v)
    assert len(by_field.get(1, [])) == len(asks)   # repeated keeps count
    assert len(by_field.get(2, [])) == len(bids)
    assert set(by_field) <= {1, 2, 3, 4, 5, 6, 7}  # closed field set
    env = decode_fields(wire.encode_stream_message("price_tick", b))
    assert [f for f, _, _ in env] == [1]           # oneof: exactly one branch


@settings(max_examples=25, deadline=None)
@given(st.lists(st.sampled_from([
    "",                                     # blank -> skipped
    "{not json",                            # corrupt -> dropped
    '{"weird": true}',                      # unknown -> retained
    '{"type":"HEARTBEAT","time":"2026-08-13T00:00:00Z"}',
    '{"type":"PRICE","time":"2026-08-13T00:00:01Z","instrument":"X_Y",'
    '"status":"t","closeoutBid":"1.0","closeoutAsk":"1.1","bids":[],"asks":[]}',
]), min_size=1, max_size=12))
def test_routing_partition_invariant(spark, tmp_path_factory, lines):
    """For ANY mix of line kinds: rows out == non-blank valid-JSON lines,
    and each line lands in exactly the right route."""
    from oanda_stream_processor_spark.sources.ndjson import read_ticks
    p = tmp_path_factory.mktemp("prop") / "cap.ndjson"
    p.write_text("\n".join(lines) + "\n")
    df = read_ticks(spark, str(p)).groupBy("message_type").count()
    got = {r.message_type: r["count"] for r in df.collect()}
    want = {"heartbeat": 0, "price_tick": 0, "unknown": 0}
    for line in lines:
        if not line.strip():
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if obj.get("type") == "HEARTBEAT":
            want["heartbeat"] += 1
        elif "instrument" in obj:
            want["price_tick"] += 1
        else:
            want["unknown"] += 1
    assert got == {k: v for k, v in want.items() if v}


# --- count-min sketch arithmetic (q132 / streaming.sketch) ----------------
# Pure-python mirror of the engine's integer hash/bucket math; the Spark
# plan itself is covered by the oracle + streaming tests. Properties:
# estimates never underestimate, and sketches merge linearly (the basis
# of the streaming partial-state design).

from collections import Counter

from oanda_stream_processor_spark.operators.textops import (
    CMS_D, CMS_W, _CMS_AFFINE, HASH_BASE, HASH_MOD)

ascii_tokens = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=6),
    min_size=1, max_size=60)


def _tok_hash(t: str) -> int:
    acc = 0
    for ch in t:
        acc = (acc * HASH_BASE + ord(ch)) % HASH_MOD
    return acc


def _cms(tokens) -> Counter:
    cells: Counter = Counter()
    for t, c in Counter(tokens).items():
        th = _tok_hash(t)
        for d, (a, b) in enumerate(_CMS_AFFINE):
            cells[(d, ((th * a + b) % HASH_MOD) % CMS_W)] += c
    return cells


def _estimate(cells: Counter, token: str) -> int:
    th = _tok_hash(token)
    return min(cells[(d, ((th * a + b) % HASH_MOD) % CMS_W)]
               for d, (a, b) in enumerate(_CMS_AFFINE))


@settings(max_examples=100)
@given(ascii_tokens)
def test_cms_never_underestimates(tokens):
    cells = _cms(tokens)
    truth = Counter(tokens)
    for t, c in truth.items():
        assert _estimate(cells, t) >= c


@settings(max_examples=100)
@given(ascii_tokens, ascii_tokens)
def test_cms_merges_linearly(a, b):
    merged = _cms(a) + _cms(b)
    oneshot = _cms(a + b)
    assert merged == oneshot
    # estimates from the merged sketch still dominate the true counts
    truth = Counter(a + b)
    for t, c in truth.items():
        assert _estimate(merged, t) >= c


# ---------------------------------------------------------------------------
# helpers.exact_tdiv: exact trunc-division on bigint columns at ANY
# magnitude — one batched Spark job over adversarial operands (both
# signs, exactly the >2^53 band where the old double spelling loses a
# unit), compared against Python's exact integers.
# ---------------------------------------------------------------------------
def test_exact_tdiv_matches_python_ints(spark):
    import random

    from oanda_stream_processor_spark.operators.helpers import exact_tdiv
    from pyspark.sql import functions as F

    rng = random.Random(8)
    cases = []
    for _ in range(300):
        mag = rng.choice([10**3, 10**9, 2**53, 2**61])
        a = rng.randrange(-mag, mag) or 1
        b = rng.randrange(1, max(2, abs(a))) * rng.choice([1, -1])
        cases.append((a, b))
    # the documented regression: exactly divisible, numerator > 2^53
    cases += [(128000000000000007, 3), (-128000000000000007, 3),
              (9007199254740993 * 1000, 1000), (2**62, 3), (-(2**62), 3)]

    def py_trunc(a, b):   # trunc toward zero, like % -identity division
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    df = spark.createDataFrame(cases, "a long, b long")
    got = df.select("a", "b",
                    exact_tdiv(F.col("a"), F.col("b")).alias("q")).collect()
    for r in got:
        assert r.q == py_trunc(r.a, r.b), (r.a, r.b, r.q)
