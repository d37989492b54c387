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
