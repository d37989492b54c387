from cassnat_asr_public_tpu.tasks.base import BaseTask, TrainState
from cassnat_asr_public_tpu.tasks.art_task import ArtTask
from cassnat_asr_public_tpu.tasks.cassnat_task import CassNATTask
from cassnat_asr_public_tpu.tasks.ctc_task import CTCTask
from cassnat_asr_public_tpu.tasks.lm_task import LMTask
from cassnat_asr_public_tpu.tasks.wav2vec_task import Wav2vecTask
from cassnat_asr_public_tpu.tasks.hubert_task import HubertTask
from cassnat_asr_public_tpu.tasks.lmnat_task import (
    LMNATTask,
    LMNAT2Task,
    LMNAT3Task,
)

TASKS = {
    "art": ArtTask,
    "cassnat": CassNATTask,
    "ctc": CTCTask,
    "lm": LMTask,
    "wav2vec": Wav2vecTask,
    "hubert": HubertTask,
    "lmnat": LMNATTask,
    "lmnat2": LMNAT2Task,
    "lmnat3": LMNAT3Task,
}
