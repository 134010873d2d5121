"""Text / URL scalar functions (SURVEY.md §2.8 F4-F7).

Reference parity:
- ``url_decode`` — the reference's ONLY user-defined function: a scalar
  UDF wrapping ``URLDecoder.decode`` with empty-string-on-failure
  (data_mart/data_mart.scala:94-99). Python twin wraps
  ``urllib.parse.unquote``. Kept as a row-at-a-time UDF deliberately: it
  is applied once per distinct URL in the reference's flow; the
  vectorized variant ``url_decode_pandas`` is the hot-path choice.
- ``extract_domain`` — regexp_extract with the reference's pattern
  ``([^:\\/\\n?]+)`` over the scheme-stripped URL
  (data_mart/data_mart.scala:102-107).
- ``strip_www`` — the reference writes ``regexp_replace(x, "www.", "")``
  where ``.`` matches ANY char (wildcard-dot bug, e.g.
  users_items/users_items.scala:34). We implement the CORRECT anchored
  pattern ``^www\\.`` — the deviation is deliberate and documented
  (SURVEY.md §7.5 risk 3).
"""

from __future__ import annotations

from urllib.parse import unquote

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import StringType


def _url_decode(url):
    # No type hints: under `from __future__ import annotations` they are
    # strings, and Spark 4's udf() tries (and fails) to infer the eval
    # type from them, warning on every import.
    if url is None:
        return ""
    try:
        return unquote(url, errors="strict")
    except Exception:
        return ""


url_decode = udf(_url_decode, returnType=StringType())


@pandas_udf(StringType())
def url_decode_pandas(urls: pd.Series) -> pd.Series:
    def dec(u):
        if u is None:
            return ""
        try:
            return unquote(u, errors="strict")
        except Exception:
            return ""

    return urls.map(dec)


SCHEME_RE = r"^https?://(www\.)?"
DOMAIN_RE = r"([^:/\n?]+)"


def strip_scheme(col: Column) -> Column:
    return F.regexp_replace(col, SCHEME_RE, "")


def extract_domain(col: Column) -> Column:
    """Domain = first capture of the reference's pattern applied to the
    scheme-stripped URL (data_mart/data_mart.scala:102-107)."""
    return F.regexp_extract(strip_scheme(col), DOMAIN_RE, 1)


def strip_www(col: Column) -> Column:
    return F.regexp_replace(col, r"^www\.", "")


def parse_host(col: Column) -> Column:
    """parse_url(url, 'HOST') — builtin invoked by name in the reference
    (features/features.scala:32 via callUDF)."""
    return F.parse_url(col, F.lit("HOST"))
