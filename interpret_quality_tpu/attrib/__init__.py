from .reward import get_reward, reward_from_logits
from .coalitions import (
    keep_matrix_from_orders,
    masked_coalitions,
    interaction_masks,
    masked_interaction_batch,
)
from .shapley import (
    ShapleyEngine,
    region_id_from_fps,
    norm_factor,
    generate_all_orders,
)

__all__ = [
    "get_reward", "reward_from_logits",
    "keep_matrix_from_orders", "masked_coalitions",
    "interaction_masks", "masked_interaction_batch",
    "ShapleyEngine", "region_id_from_fps", "norm_factor",
    "generate_all_orders",
]
