from .mesh import (
    initialize_distributed,
    make_mesh,
    pairwise_mean,
    pairwise_sum,
    shard_position,
    shard_samples,
    tree_pairwise_mean,
)
