"""HTML -> text extraction with the byte-identical-per-url invariant.

The reference's correctness bar (BASELINE.json): *byte-identical extracted
text per url*. Extraction is an Arrow-vectorized pandas UDF over the binary
``html`` column — pandas string kernels on whole batches, never per-row
Python — and also parses the embedded geo micro-degrees so geocoding is
exact (no float round-trip through text).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from versatiles_rs_spark.pages.generator import HTML_MID, HTML_PREFIX, HTML_SUFFIX


def _extract_batch(html: pd.Series) -> pd.DataFrame:
    """Vectorized extraction on one Arrow batch."""
    s = html.str.decode("utf-8")
    # geo content sits between HTML_PREFIX and HTML_MID as "lon_udeg,lat_udeg"
    body_split = s.str.split(HTML_MID, n=1, expand=True)
    head, body = body_split[0], body_split[1]
    geo = head.str.slice(start=len(HTML_PREFIX)).str.split(",", expand=True)
    return pd.DataFrame(
        {
            "extracted_text": body.str.removesuffix(HTML_SUFFIX),
            "lon_udeg": pd.to_numeric(geo[0]).astype("int64"),
            "lat_udeg": pd.to_numeric(geo[1]).astype("int64"),
        }
    )


def with_extracted_text(pages: DataFrame) -> DataFrame:
    """Append extracted_text / lon / lat columns to a pages DataFrame.

    Single mapInPandas pass that carries all input columns through — no
    self-join, no extra shuffle; the Arrow batch is decoded once.
    """
    out_schema = StructType(
        list(pages.schema.fields)
        + [
            StructField("extracted_text", StringType()),
            StructField("lon_udeg", LongType()),
            StructField("lat_udeg", LongType()),
        ]
    )
    in_cols = [f.name for f in pages.schema.fields]

    def extract_text(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ext = _extract_batch(pdf["html"])
            yield pd.concat([pdf[in_cols].reset_index(drop=True), ext], axis=1)

    extracted = pages.mapInPandas(extract_text, schema=out_schema)
    return extracted.withColumn("lon", F.col("lon_udeg").cast("double") / 1e6 - 180.0).withColumn(
        "lat", F.col("lat_udeg").cast("double") / 1e6 - 85.0
    )
