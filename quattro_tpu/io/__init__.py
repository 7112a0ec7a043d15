"""Native (C++) trajectory-log shard IO with a pure-Python fallback."""

from quattro_tpu.io.shardio import (  # noqa: F401
    ShardReader,
    ShardWriter,
    index_shard,
    merge_shards,
    native_available,
    read_shard,
)

__all__ = [
    "ShardReader",
    "ShardWriter",
    "index_shard",
    "merge_shards",
    "native_available",
    "read_shard",
]
