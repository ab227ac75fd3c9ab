from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
    scaled_dot_attention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.autocorrelation import (
    auto_correlation,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.conv_attention import (
    ACATAttention,
    ATAAttention,
    BatchStatsNorm,
    ConvAttnAttention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.decomposition import (
    MyLayerNorm,
    SeriesDecompMulti,
    moving_avg,
    series_decomp,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.fourier import (
    FourierBlock,
    FourierCrossAttention,
    get_frequency_modes,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.full_attention import (
    full_attention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.probsparse import (
    prob_sparse_attention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.wavelet import (
    MultiWaveletCross,
    MultiWaveletTransform,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.wavelet_filters import (
    filter_bank,
)

__all__ = [
    "scaled_dot_attention",
    "auto_correlation",
    "ACATAttention",
    "ATAAttention",
    "BatchStatsNorm",
    "ConvAttnAttention",
    "MyLayerNorm",
    "SeriesDecompMulti",
    "moving_avg",
    "series_decomp",
    "FourierBlock",
    "FourierCrossAttention",
    "get_frequency_modes",
    "full_attention",
    "prob_sparse_attention",
    "MultiWaveletCross",
    "MultiWaveletTransform",
    "filter_bank",
]
