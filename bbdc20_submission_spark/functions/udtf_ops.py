"""Python UDTF surface (Spark 4): table-generating functions.

SURVEY §2.8 notes the reference needs no UDTF (explode covers its one
row-generating op); this module certifies the API anyway for the
engine's completeness: a sentence splitter whose output cardinality is
data-dependent — the case where a UDTF is genuinely more natural than
sequence+explode.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx int, sentence string, n_chars int")
class SplitSentences:
    """Emit one row per '.'/'!'/'?'-terminated sentence of the input."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        buf = []
        idx = 0
        for ch in text:
            buf.append(ch)
            if ch in ".!?":
                s = "".join(buf).strip()
                if s:
                    yield idx, s, len(s)
                    idx += 1
                buf = []
        tail = "".join(buf).strip()
        if tail:
            yield idx, tail, len(tail)
