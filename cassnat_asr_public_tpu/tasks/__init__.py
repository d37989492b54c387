from cassnat_asr_public_tpu.tasks.base import BaseTask, TrainState
from cassnat_asr_public_tpu.tasks.art_task import ArtTask
from cassnat_asr_public_tpu.tasks.cassnat_task import CassNATTask
from cassnat_asr_public_tpu.tasks.ctc_task import CTCTask
from cassnat_asr_public_tpu.tasks.lm_task import LMTask

TASKS = {
    "art": ArtTask,
    "cassnat": CassNATTask,
    "ctc": CTCTask,
    "lm": LMTask,
}
