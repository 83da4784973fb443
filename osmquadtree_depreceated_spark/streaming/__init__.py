from .changes import apply_change_batches, stream_apply_changes  # noqa: F401
