from parrsb_spark.functions.spmv import gather_scatter, degrees, symmetrize
from parrsb_spark.functions.ids import dense_ids, dense_ids_scalable, grouped_rank
from parrsb_spark.functions.hashing import md5_long_col, MOD_P, HASH_SALT_A, HASH_SALT_B

__all__ = [
    "gather_scatter",
    "degrees",
    "symmetrize",
    "dense_ids",
    "dense_ids_scalable",
    "grouped_rank",
    "md5_long_col",
    "MOD_P",
    "HASH_SALT_A",
    "HASH_SALT_B",
]
