# -*- coding: utf-8 -*-
from .mesh import (  # noqa: F401
    make_mesh,
    use_mesh,
    active_mesh,
    set_active_mesh,
    resolve_parallel,
    trial_sharding,
    replicated_sharding,
    shard_batch,
    init_distributed,
    cluster_cleanup,
    TRIAL_AXIS,
    CHANNEL_AXIS,
)
