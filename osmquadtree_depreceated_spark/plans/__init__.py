from .lineage import SnapshotStore  # noqa: F401
