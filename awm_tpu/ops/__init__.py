from awm_tpu.ops.conv import conv1d, conv_transpose1d
from awm_tpu.ops.lstm import lstm_cell, lstm_forward, lstm_stack

__all__ = ["conv1d", "conv_transpose1d", "lstm_cell", "lstm_forward", "lstm_stack"]
