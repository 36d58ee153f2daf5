from .pipeline import CheckpointedRun, chunk_of, input_fingerprint, partition_metrics

__all__ = ["CheckpointedRun", "chunk_of", "input_fingerprint", "partition_metrics"]
