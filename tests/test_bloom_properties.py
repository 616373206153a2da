"""KeyBloom soundness/quality + XXH64 reference vectors (no Spark)."""

from __future__ import annotations

import random
import string

from ml_data_pipeline_spark.lake.bloom import (
    bloom_build,
    bloom_might_contain,
    xxh64,
)


def test_xxh64_known_vectors():
    """Public xxHash reference values (seed 0) — pins the port against
    the spec, independent of Spark."""
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", seed=0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", seed=0) == 0x44BC2CF5AD770999
    # >32 bytes exercises the 4-lane block path
    assert (
        xxh64(b"xxhash is a fast non-cryptographic hash algorithm", seed=0)
        == xxh64(b"xxhash is a fast non-cryptographic hash algorithm", seed=0)
    )
    # seed changes the hash
    assert xxh64(b"abc", seed=1) != xxh64(b"abc", seed=0)


def test_bloom_no_false_negatives_and_bounded_fpr():
    rng = random.Random(99)

    def rand_key():
        return "".join(
            rng.choices(string.ascii_letters + string.digits, k=rng.randint(1, 24))
        )

    members = list({rand_key() for _ in range(2000)})
    outside = list(
        {rand_key() for _ in range(4000)} - set(members)
    )[:2000]
    b = bloom_build(members)
    # soundness: NEVER a false negative
    for k in members:
        assert bloom_might_contain(b, k)
    # quality: ~1% design FPR; assert a loose 5% bound
    fp = sum(1 for k in outside if bloom_might_contain(b, k))
    assert fp / len(outside) < 0.05, fp

    # integer keys hash through the bigint path — same guarantees
    imembers = list(range(0, 3000, 3))
    ib = bloom_build(imembers)
    for k in imembers:
        assert bloom_might_contain(ib, k)
    ifp = sum(1 for k in range(1, 3000, 3) if bloom_might_contain(ib, k))
    assert ifp / 1000 < 0.05, ifp


def test_xxh64_batch_parity():
    """The vectorized batch hasher (used by bloom_build on the write
    path) must be bit-identical to the scalar port for every input
    class: variable-length strings (incl. empty and >32-byte block
    path), integers, numpy arrays, and pyarrow string/large_string/
    int64 arrays including non-zero-offset slices."""
    import numpy as np
    import pyarrow as pa

    from ml_data_pipeline_spark.lake.bloom import xxh64_batch, xxh64_long

    rng = random.Random(11)
    keys = [
        "".join(rng.choices(string.printable, k=rng.randint(0, 90)))
        for _ in range(300)
    ] + ["doc_%06d" % i for i in range(300)] + [""]
    want = np.array([xxh64(k.encode("utf-8")) for k in keys], dtype=np.uint64)
    assert (xxh64_batch(keys) == want).all()
    for typ in (pa.string(), pa.large_string()):
        assert (xxh64_batch(pa.array(keys, type=typ)) == want).all()
    sliced = pa.array(keys).slice(50, 400)
    assert (xxh64_batch(sliced) == want[50:450]).all()

    ints = [rng.randint(-(2**62), 2**62) for _ in range(500)]
    iwant = np.array([xxh64_long(v) for v in ints], dtype=np.uint64)
    assert (xxh64_batch(ints) == iwant).all()
    assert (xxh64_batch(np.array(ints)) == iwant).all()
    assert (xxh64_batch(pa.array(ints)) == iwant).all()
    assert len(xxh64_batch([])) == 0


def test_bloom_empty_and_garbage():
    b = bloom_build([])
    assert not bloom_might_contain(b, "anything")
    # un-parseable bloom must fail OPEN (never prune on doubt)
    assert bloom_might_contain("not-base64!!", "x")
    assert bloom_might_contain("", "x")


def test_feed_and_index_sync_stay_distributed():
    """The CDC-feed pump and index sync must never materialize data on
    the driver: no collect/toPandas/count in their hot paths (probe
    APIs like containing_all/contaminated_docs are point lookups and
    exempt)."""
    import ast
    import inspect
    import textwrap

    from ml_data_pipeline_spark.lake.feed import ChangesFeed
    from ml_data_pipeline_spark.lake.token_index import TokenIndex

    for fn in (ChangesFeed.pump_into, ChangesFeed.poll, TokenIndex.sync):
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
        actions = [
            n.func.attr
            for n in ast.walk(tree)
            if isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr in ("collect", "toPandas", "count")
            and not (
                isinstance(n.func.value, ast.Name) and n.func.value.id == "F"
            )
        ]
        assert not actions, (fn.__qualname__, actions)
