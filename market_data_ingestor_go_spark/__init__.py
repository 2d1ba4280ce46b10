"""market_data_ingestor_go_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``msharukh-dev/market-data-ingestor-go`` (a Go WebSocket market-data
ingestion + redistribution service) as an idiomatic PySpark library:

- sources/  : table loaders + streaming sources (incl. a WebSocket
              streaming source skeleton mirroring reference S1/S2)
- functions/: column-level transforms (validation P1, flatten P3,
              hashing P10, json P11, text analysis)
- operators/: dataflow operators (latest-per-key A1, enrichment joins
              J1-J3, config-driven transform engine §2.8, dedup,
              similarity search, multimodal plumbing)
- plans/    : the declared query corpus + DuckDB oracle SQL twins
- streaming/: the ingest (E1) and serve (E2) structured-streaming
              pipelines with exactly-once foreachBatch dual sinks

Everything is stock Spark DataFrame/SQL — no custom Catalyst rules
(see SURVEY.md §4): Catalyst + AQE provide pushdown, broadcast,
codegen and skew handling; the library only contributes operators,
semantics and pipeline wiring.
"""

__version__ = "0.1.0"
