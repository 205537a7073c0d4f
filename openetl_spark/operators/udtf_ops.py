"""Python UDTFs (user-defined table functions, Spark 4) — the C25
extension surface beyond scalar/grouped UDFs: one input row → many
output rows, composable in SQL via LATERAL joins.

Two demonstrations:

* ``ShingleUDTF`` — text → (position, shingle) rows: the row-expanding
  form of the dedup shingler (the Column-expression version in
  operators/dedup.py remains the hot path; the UDTF form is the
  user-extensibility slot).
* ``ExpandJsonUDTF`` — a JSON object string → (key, value) rows
  (schema-on-read explosion for semi-structured payloads).

Register per-session with ``register_udtfs(spark)``; then
``SELECT s.* FROM docs, LATERAL shingle_udtf(text, 3) s``.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, shingle string")
class ShingleUDTF:
    def eval(self, text: str, n: int = 3):
        if not text:
            return
        words = [w for w in text.split() if w]
        if len(words) <= n:
            yield 0, " ".join(words)
            return
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i : i + n])


@udtf(returnType="key string, value string")
class ExpandJsonUDTF:
    def eval(self, payload: str):
        if not payload:
            return
        try:
            obj = json.loads(payload)
        except (ValueError, TypeError):
            return
        if isinstance(obj, dict):
            for k, v in obj.items():
                yield str(k), None if v is None else str(v)


def register_udtfs(spark) -> None:
    spark.udtf.register("shingle_udtf", ShingleUDTF)
    spark.udtf.register("expand_json_udtf", ExpandJsonUDTF)
