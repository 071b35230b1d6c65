from versatiles_rs_spark.dedup.minhash import (  # noqa: F401
    minhash_band_keys,
    minhash_dedup_pairs,
    minhash_signatures,
)
from versatiles_rs_spark.dedup.ngram import jaccard_pairs, shingle_set  # noqa: F401
from versatiles_rs_spark.dedup.simhash import simhash_dedup_pairs, simhash_signatures  # noqa: F401
