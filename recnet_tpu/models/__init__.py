from recnet_tpu.models.decoder import (
    DecoderConfig, init_decoder_params, decoder_step, teacher_forced_rollout,
    zero_state)
from recnet_tpu.models.reconstructors import (
    ReconstructorConfig, init_reconstructor_params, recon_loss,
    global_recon_loss, local_recon_loss)
