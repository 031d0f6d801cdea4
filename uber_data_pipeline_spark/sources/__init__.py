"""Source connectors: explicit-schema batch readers, incremental
(high-watermark) ingest, and the streaming CDC analog — the engine's
counterpart to the reference's Airbyte extract/load layer
(/root/reference/Diary of Making.md §3–4)."""
