from gvom_tpu.models.pipeline import (
    ingest_scan,
    buffer_insert,
    combine,
    ingest_and_insert,
    full_step,
)

__all__ = ["ingest_scan", "buffer_insert", "combine", "ingest_and_insert", "full_step"]
