from .entropy import normalized_entropy, shannon_entropy
from .kmeans import ClusterBanks, cluster_matching, cluster_objects
from .matching import (
    WRONG_LABEL_PADDING_DISTANCE,
    foreground2background,
    global_matching_bank,
    local_matching_bank,
    local_matching_bank_stacked,
    local_pairwise_distances,
    proxy_matching,
    squash_distance,
)
from .proxies import AttentionHeads, attention_heads, proxy_reconstructed_embedding
from .resize import resize_hw, resize_nchw_like

__all__ = [
    "WRONG_LABEL_PADDING_DISTANCE",
    "AttentionHeads",
    "ClusterBanks",
    "attention_heads",
    "cluster_matching",
    "cluster_objects",
    "foreground2background",
    "global_matching_bank",
    "local_matching_bank",
    "local_matching_bank_stacked",
    "local_pairwise_distances",
    "normalized_entropy",
    "proxy_matching",
    "proxy_reconstructed_embedding",
    "resize_hw",
    "resize_nchw_like",
    "shannon_entropy",
    "squash_distance",
]
