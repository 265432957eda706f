"""TPU-native transformer quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Qualcomm's
``transformer-quantization`` reference (EMNLP 2021, "Understanding and
Overcoming the Challenges of Efficient Transformer Quantization"):

- asymmetric/symmetric uniform fake quantization with STE
  (reference: quantization/quantizers.py)
- current/all/running min-max, MSE (grid / golden-section) and cross-entropy
  range estimation (reference: quantization/range_estimators.py)
- the estimate/fix/learn range state machine as *static phase specialization*
  of jitted functions (reference: quantization/quantization_manager.py)
- per-embedding and per-embedding-group (PEG) activation quantization with
  range-based channel permutation (reference: utils/per_embd_quant_utils.py)
- AdaRound learned weight rounding (reference: quantization/adaround/)
- quantized BERT / RoBERTa / MobileBERT model families
  (reference: models/quantized_{bert,roberta,mobilebert}.py), plus
  DistilBERT / ALBERT / SqueezeBERT, which the reference can only run as
  FP32 baselines (utils/hf_models.py)
- a ``quant_dict`` mixed-precision override language (reference: main.py:443-498)
- GLUE train/validate pipeline (reference: main.py, utils/glue_tasks.py)

Unlike the reference, which *simulates* quantization in float32, this
framework also provides a real-integer execution path: int8 / packed-int4
weight storage and fused dequantize-matmul Pallas TPU kernels,
mesh-sharded (DP x TP) execution via jax.sharding/pjit, a
continuous-batching serving engine with an HTTP front end, checkpointing
of the full calibration artifact, and a native C++ WordPiece tokenizer.
"""

__version__ = "0.1.0"
