"""THE byte-surrogate transcode, defined once (r12 review finding #5).

Byte-semantics mode (`bytes=True` across the fuzzy family) works by
re-reading UTF-8 strings as ISO-8859-1: every UTF-8 byte becomes
exactly one character (bijective — ISO-8859-1 maps bytes 0x00-0xFF to
codepoints U+0000-U+00FF), so all kernels, length bands, and caps
count bytes without change, and UTF-8 byte order equals codepoint
order, so sorts/tie-breaks survive the round trip.

Build, deltas, query, point lookup, and serving must all agree on this
transcode — a drift in any one copy (charset name, null handling)
would silently desynchronize the build's byte space from the query's
and corrupt every non-ASCII lookup. Hence ONE definition for the
column form and one for the plain-Python form, used everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_byte_surrogate(col: "Column | str") -> Column:
    """UTF-8 string column → byte-surrogate string column (one char
    per UTF-8 byte)."""
    return F.decode(F.encode(col, "UTF-8"), "ISO-8859-1")


def from_byte_surrogate(col: "Column | str") -> Column:
    """Byte-surrogate string column → the original UTF-8 string."""
    return F.decode(F.encode(col, "ISO-8859-1"), "UTF-8")


def py_to_byte_surrogate(s: str) -> str:
    """Plain-Python twin of ``to_byte_surrogate`` (driver-side point
    lookups and serving handlers)."""
    return s.encode("utf-8").decode("latin-1")


def py_from_byte_surrogate(s: str) -> str:
    return s.encode("latin-1").decode("utf-8")
