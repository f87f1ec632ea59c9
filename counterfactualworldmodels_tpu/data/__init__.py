from .shards import (write_shard, read_shard_header, build_native,
                     NativeClipLoader, PythonClipLoader)
from .utils import FlowToRgb, RgbFlowToXY, rgb_to_xy_flows
