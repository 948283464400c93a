# Runtime defaults (reference MCT/configs/_base_/default_runtime.py:
# checkpoint interval 1, eval each epoch).  Override per-config or with
# dotted --cfg-options.
eval_interval = 1
total_epochs = 15
