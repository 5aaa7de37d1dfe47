from .mesh import (
    make_mesh,
    coalition_sharding,
    replicate,
    pad_to_multiple,
)

__all__ = ["make_mesh", "coalition_sharding", "replicate", "pad_to_multiple"]
