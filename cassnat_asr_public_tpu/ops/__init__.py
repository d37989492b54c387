from cassnat_asr_public_tpu.ops.ctc import (
    LOG_ONE,
    LOG_ZERO,
    align_to_trigger_mask,
    ctc_best_path_align,
    ctc_forward_score,
    ctc_greedy_collapse,
    ctc_loss,
    ctc_viterbi_align,
    expand_trigger_mask,
)
from cassnat_asr_public_tpu.ops.ctc_prefix import (
    initial_state,
    mask_ctc_out,
    prefix_score_step,
)
from cassnat_asr_public_tpu.ops.frontend import (
    apply_cmvn,
    kaldi_mel_banks,
    log_mel_fbank,
    spec_augment_jit,
)
from cassnat_asr_public_tpu.ops.ssl import (
    compute_span_mask,
    gather_fixed_count,
    infonce_logits,
    sample_negatives,
)
