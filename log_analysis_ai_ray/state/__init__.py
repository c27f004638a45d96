"""Job-level state: checkpoint/resume manifests, metrics, lineage."""
