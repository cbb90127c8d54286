"""Incremental ingestion: the reference's AppendableEntryStream as
checkpointed micro-batches."""
