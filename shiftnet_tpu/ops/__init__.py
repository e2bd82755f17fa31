from shiftnet_tpu.ops.shift import (
    gsts, grouped_spatial_shift, temporal_channel_shift, shift_dir_table,
)
from shiftnet_tpu.ops.norm import layer_norm_2d
from shiftnet_tpu.ops.resize import bilinear_up2x, pixel_shuffle
