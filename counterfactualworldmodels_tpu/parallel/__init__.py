from .mesh import (make_mesh, sample_parallel_mesh, param_shardings,
                   partition_spec_for, shard_params, replicate,
                   VMAE_PARTITION_RULES)
from .inference import shard_counterfactual_batch, sharded_counterfactuals
