from .mesh import (make_mesh, sample_parallel_mesh, param_shardings,
                   partition_spec_for, shard_params, replicate,
                   opt_state_shardings, VMAE_PARTITION_RULES,
                   CONJOINED_PARTITION_RULES)
from .tensor import tensor_parallel_blocks, make_tp_encoder_forward
from .inference import (shard_counterfactual_batch, sharded_counterfactuals,
                        sharded_imu_counterfactuals,
                        sharded_counterfactuals_fast,
                        sharded_counterfactuals_fast_multi,
                        sharded_imu_counterfactuals_fast)
from .pipeline import (stack_block_params, unstack_block_params,
                       pipelined_blocks, make_pp_encoder_forward)
from .sequence import sequence_parallel_blocks, make_sp_encoder_forward
from .covariance import sharded_flow_corrs
from .multihost import (initialize_distributed, make_hybrid_mesh,
                        host_local_batch_to_global,
                        process_local_batch_size)
