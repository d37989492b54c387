from cassnat_asr_public_tpu.data.vocab import Vocab
from cassnat_asr_public_tpu.data.tokenizer import (
    CharTokenizer,
    SPModelTokenizer,
    WordpieceTokenizer,
)
from cassnat_asr_public_tpu.data.datasets import (
    DynamicDataset,
    SpeechDataLoader,
    SpeechDataset,
)
from cassnat_asr_public_tpu.data.audio_loader import (
    HubertDataset,
    HubertLoader,
    SSLCropLoader,
    read_wav,
)
from cassnat_asr_public_tpu.data.text_loader import TextDataLoader, TextDataset
