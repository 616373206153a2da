"""HTTP(S) source: distributed fetch over a URL list (reference S14).

The reference's reader crate declares an `http` feature gate
(/root/reference/ml-data/ml-data-readers/Cargo.toml:12-18) — remote
objects fetched into the same decode pipeline as local files. The
Spark-native shape: the URL list is a DataFrame, each partition
fetches its URLs executor-side inside ``mapInPandas`` (urllib —
stdlib, no extra dependency), and the payload lands as a ``binary``
column feeding the existing sniff/decode operators
(operators/multimodal.py). The driver never touches payload bytes.

Scale notes: parallelism = URL-list partitions (repartition to the
desired fetch concurrency); failures are rows, not exceptions (a
10^8-object crawl must not abort on one 404) — status/error travel
with each row and the caller filters. In this sandbox the demo
exercises ``file://`` URLs (no network egress), which urllib serves
through the same interface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("length", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def read_http(
    spark: SparkSession,
    urls: list[str] | DataFrame,
    *,
    timeout_sec: float = 30.0,
    max_bytes: int = 64 * 1024 * 1024,
    partitions: int | None = None,
) -> DataFrame:
    """Fetch each URL on the executors; one row per URL, errors as data.

    ``max_bytes`` caps a single response (a runaway object must not
    OOM its task); oversized responses are truncated with
    ``error='truncated'`` so the caller can decide.
    """
    if isinstance(urls, DataFrame):
        url_df = urls.select(urls.columns[0])
    else:
        url_df = spark.createDataFrame([(u,) for u in urls], "url string")
    if partitions:
        url_df = url_df.repartition(partitions)

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request

        for pdf in batches:
            out = {"url": [], "status": [], "content": [], "length": [],
                   "error": []}
            for u in pdf.iloc[:, 0]:
                status, content, err = None, None, None
                try:
                    with urllib.request.urlopen(u, timeout=timeout_sec) as r:
                        status = getattr(r, "status", 200) or 200
                        content = r.read(max_bytes + 1)
                        if len(content) > max_bytes:
                            content = content[:max_bytes]
                            err = "truncated"
                except urllib.error.HTTPError as e:
                    status, err = e.code, f"http_error: {e.reason}"
                except Exception as e:  # URLError, timeout, bad scheme…
                    err = f"{type(e).__name__}: {e}"
                out["url"].append(u)
                out["status"].append(status)
                out["content"].append(content)
                out["length"].append(None if content is None else len(content))
                out["error"].append(err)
            yield pd.DataFrame(out)

    return url_df.mapInPandas(_fetch, FETCH_SCHEMA)
