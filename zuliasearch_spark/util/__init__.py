from zuliasearch_spark.util.hashing import djb2_hash, find_shard_for_unique_id
from zuliasearch_spark.util.smallfloat import byte4_to_int, int_to_byte4
from zuliasearch_spark.util.varint import varint_decode, varint_encode

__all__ = [
    "djb2_hash",
    "find_shard_for_unique_id",
    "int_to_byte4",
    "byte4_to_int",
    "varint_encode",
    "varint_decode",
]
