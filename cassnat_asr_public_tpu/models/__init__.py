"""Model factories, mirroring the reference export surface
(reference: src/models/__init__.py:1-12)."""

from cassnat_asr_public_tpu.models.transformer import (
    Transformer,
    make_model as make_transformer,
)
from cassnat_asr_public_tpu.models.conformer import (
    Conformer,
    make_model as make_conformer,
)
from cassnat_asr_public_tpu.models.ctc_model import (
    CTCModel,
    make_model as make_ctc_model,
)
from cassnat_asr_public_tpu.models.cassnat import (
    CassNAT,
    make_model as make_cassnat,
)
from cassnat_asr_public_tpu.models.lm import (
    TransformerLM,
    make_model as make_lm,
)
