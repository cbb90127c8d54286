"""Session configuration, retention-tier pipelines, checkpoint/lineage."""
