from .manifest import PartitionManifest, read_manifests, completed_partitions

__all__ = ["PartitionManifest", "read_manifests", "completed_partitions"]
