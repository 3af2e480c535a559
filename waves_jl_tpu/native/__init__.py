from .store import (
    NATIVE_AVAILABLE,
    SHARD_AVAILABLE,
    ShardWriter,
    load_bundle,
    load_shard,
    save_bundle,
)
