"""pd_fusion — TPU-native multimodal PD/HC classification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``Ardbiu/robust-multimodal-pd`` (``pd_fusion``) research framework:
config-driven experiment pipelines with K-fold CV, missingness-scenario
robustness evaluation, calibration, mask-conditioned conformal abstention,
risk-coverage analysis, MRI feature/embedding extraction and MIL attention
models — with the numeric hot paths (model training, metrics, masking,
attention pooling, image resampling) running as jitted XLA/Pallas programs
on TPU, and host Python reserved for ETL/plots/orchestration.

Public surface mirrors the reference (``pd_fusion.cli`` with
``run``/``validate-data``/``train``/``evaluate``/``download-dev``/
``prepare-dev``; same YAML config schema; same run-dir artifact names).
"""

__version__ = "0.1.0"
