"""Row-wise external-API enrichment with failure fallback — the
reference's Google-Places geocoding sweep (U1: `1c. Look for provider
locations.R:139-216`, tryCatch + pbmapply over ~500 providers).

Spark shape: mapInPandas with per-row try/except producing a `status`
column ('OK' | 'ZERO_RESULTS' | 'fail') and NULL result fields on
failure — the reference's fallback rows (1c.R:204-215) — so one bad
row never kills a batch. The API client is injected; the default is a
deterministic offline fake (no network in this container, and the real
key lives outside the repo — reference `.gitignore:8`).

At the reference's cardinality (~500 rows) this runs in one task; the
same operator scales to millions of rows with `repartition(n)` for
rate-limit-bounded parallelism.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

GEOCODE_SCHEMA = (
    "provider_code string, postcode string, status string, "
    "number_results int, lat double, long double, address string"
)


def fake_geocoder(postcode: str) -> dict:
    """Deterministic offline stand-in for the Places API: hash-derived
    coordinates; empty/odd postcodes exercise the failure branches."""
    if not postcode or not postcode.strip():
        raise ValueError("empty postcode")
    if postcode.startswith("ZZ"):
        return {"number_results": 0}
    h = hashlib.sha1(postcode.encode()).digest()
    return {
        "number_results": 1 + h[3] % 3,
        "lat": 49.0 + h[0] / 32.0,
        "long": -6.0 + h[1] / 32.0,
        "address": f"{postcode} HOUSE",
    }


def geocode_providers(
    df: DataFrame,
    client: Callable[[str], dict] = fake_geocoder,
    code_col: str = "provider_code",
    postcode_col: str = "postcode",
) -> DataFrame:
    """(provider, postcode) → geocode result rows with status column.
    Failures become 'fail' rows with NULL coordinates (1c.R:204-215);
    zero-hit lookups become 'ZERO_RESULTS' (1c.R:186-190)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for code, pc in zip(pdf[code_col], pdf[postcode_col]):
                row = {
                    "provider_code": code,
                    "postcode": pc,
                    "status": "fail",
                    "number_results": None,
                    "lat": None,
                    "long": None,
                    "address": None,
                }
                try:
                    res = client(pc)
                    if res.get("number_results", 0) == 0:
                        row.update(status="ZERO_RESULTS", number_results=0)
                    else:
                        # copy ONLY schema fields: a real client's extra
                        # keys (place_id, ...) would widen the frame and
                        # fail the whole Arrow batch against the schema
                        row.update(
                            status="OK",
                            **{k: res[k] for k in row.keys() & res.keys()},
                        )
                except Exception:
                    pass  # keep the 'fail' fallback row
                out.append(row)
            yield pd.DataFrame(out)

    return df.select(code_col, postcode_col).mapInPandas(batches, GEOCODE_SCHEMA)
