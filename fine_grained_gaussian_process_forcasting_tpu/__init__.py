"""TPU-native forecast -> GP-blur -> denoise framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
SepKfr/Fine_grained_Gaussian_Process_Forcasting ("Coarse and Fine-Grained
Forecasting Via Gaussian Process Blurring Effect").

Layer map (mirrors SURVEY.md section 1, re-architected TPU-first):

- ``data``      dataset formatters, vectorized window sampling, device-resident
                batching (reference: ``data/``, ``Utils/base_train.py``)
- ``gp``        from-scratch whitened variational deep GP stack
                (reference: gpytorch inside ``denoising_model/DeepGP.py``)
- ``ops``       attention / correlation op zoo incl. Pallas kernels
                (reference: ``forecasting_models/*.py``, ``layers/*.py``)
- ``models``    Flax model assembly: transformer, forecast-blur-denoise
                composite, baseline models (reference: ``modules/``,
                ``forecast_denoising.py``)
- ``train``     jitted scan trainer, Noam schedule, native HPO, eval harness
                (reference: ``train.py``, ``baselines.py``, ``evaluate.py``)
- ``parallel``  device mesh + sharding rules (reference has none; see
                SURVEY.md section 2.6)
"""

__version__ = "0.1.0"
