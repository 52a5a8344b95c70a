"""models — acoustic encoders with chain + xent heads (flax).

The model zoo the reference ecosystem trains with chain loss (SURVEY.md
section 2 / BASELINE.json configs): TDNN (dilated-conv context splicing),
TDNN-F (factored layers with the semi-orthogonal constraint), TDNN-LSTM
(projected-LSTM layers interleaved, the Kaldi tdnn-lstm chain family),
CNN-TDNN (2-D conv front end over the time x mel plane, the Kaldi
cnn_tdnn family), and a conformer encoder.  All emit two heads over shared trunk features:
chain-head raw outputs y (unnormalized log-likelihoods, no prior division)
and xent-head logits for the cross-entropy regularizer
(kaldi chain recipes' output / output-xent pair).
"""

from torchain_tpu.models.tdnn import (
    TDNN,
    TDNNF,
    ChainBatchNorm,
    TdnnConfig,
    TdnnfConfig,
)
from torchain_tpu.models.cnn import CNNTDNN, CnnTdnnConfig
from torchain_tpu.models.conformer import Conformer, ConformerConfig
from torchain_tpu.models.lstm import TDNNLSTM, Lstmp, Opgru, TdnnLstmConfig
from torchain_tpu.models.semi_orthogonal import (
    constrain_semi_orthogonal,
    semi_orthogonal_step,
)

__all__ = [
    "TDNN",
    "ChainBatchNorm",
    "TDNNF",
    "TdnnConfig",
    "TdnnfConfig",
    "CNNTDNN",
    "CnnTdnnConfig",
    "Conformer",
    "ConformerConfig",
    "TDNNLSTM",
    "Lstmp",
    "Opgru",
    "TdnnLstmConfig",
    "constrain_semi_orthogonal",
    "semi_orthogonal_step",
]
