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

import re
from urllib.parse import unquote_plus

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import StringType


# URLDecoder.decode throws IllegalArgumentException on a '%' not
# followed by two hex digits (including a truncated escape at
# end-of-string); the reference's catch turns that into "".
_MALFORMED_PCT = re.compile(r"%(?![0-9a-fA-F]{2})")


def _url_decode(url):
    # No type hints: under `from __future__ import annotations` they are
    # strings, and Spark 4's udf() tries (and fails) to infer the eval
    # type from them, warning on every import.
    #
    # Faithful java.net.URLDecoder.decode(s, "UTF-8") semantics
    # (round-13 review — plain unquote diverged on all three fronts):
    # '+' decodes to space, a malformed %-escape returns "" (URLDecoder
    # throws; the reference catches to ""), and valid-%-but-invalid-
    # UTF-8 bytes decode to U+FFFD (CharsetDecoder REPLACE).
    if url is None:
        return ""
    if _MALFORMED_PCT.search(url):
        return ""
    return unquote_plus(url, errors="replace")


url_decode = udf(_url_decode, returnType=StringType())


@pandas_udf(StringType())
def url_decode_pandas(urls: pd.Series) -> pd.Series:
    return urls.map(_url_decode)


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
