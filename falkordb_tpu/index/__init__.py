"""L3' — indexes: range (sorted-column), fulltext (inverted index), vector
(brute-force device top-k; the TPU-native answer to HNSW — exact kNN as a
single bf16 matmul on the MXU beats pointer-chasing graphs on this
hardware).  Reference: graph/src/index/."""
