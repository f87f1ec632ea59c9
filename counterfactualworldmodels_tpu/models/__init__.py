from . import vmae, layers, transformer, preprocessor, conjoined, cmae
from .raft.raft import RAFT, apply_raft_video, init_raft_params
