"""Live-API enrichment pattern (SURVEY §2.A3).

The reference enriches each sale with point REST lookups
(api_to_gcs/main.py:56-73,205-231 — pdv.pedido.obter, produto.obter,
pedidos.pesquisa). The correctness harness models those as joins
against snapshot dimension tables (operators/joins.py); THIS module is
the documented scale pattern for when a live service must be called:
``mapInPandas`` with one batched request per Arrow batch — 10-100×
fewer round trips than per-row calls, Python cost amortized over the
batch, and backpressure via ``spark.sql.execution.arrow.maxRecordsPerBatch``.

No HTTP client ships here (the engine stays hermetic): callers inject
``fetch_batch(keys) -> {col: [values]}``, tests use a deterministic
fake. Transport retries belong in fetch_batch (the reference used
tenacity, S4); Spark task retries cover worker death.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def batched_lookup_enrich(
    df: DataFrame,
    key_col: str,
    fetch_batch: Callable[[list], dict[str, list]],
    output_schema: str,
) -> DataFrame:
    """Enrich rows with service-fetched columns, one call per batch.

    ``output_schema`` is the DDL of the full output (input columns plus
    fetched columns) — declared up front so the plan has a stable shape
    regardless of what the service returns.
    """

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fetched = fetch_batch(pdf[key_col].tolist())
            yield pdf.assign(**fetched)

    return df.mapInPandas(gen, output_schema)
