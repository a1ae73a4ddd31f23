from recnet_tpu.ops.rnn import (
    init_rnn_params, lstm_cell, gru_cell, rnn_step, zero_state)
from recnet_tpu.ops.attention import (
    init_attention_params, precompute_uv, attention_scores, attend_mean)
from recnet_tpu.ops.losses import step_mean_ce, l2_norm_sum, mse
