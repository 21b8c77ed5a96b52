"""Neural-net layers as pure functions over parameter pytrees.

TPU-first re-design of the reference's ``srt/layers/`` suite (TP linear
classes ``linear.py:102-1130``, ``radix_attention.py``, rotary, norms,
``logits_processor.py``, ``sampler.py``): instead of module classes that
own rank-sharded torch tensors, every layer is a pure function over a
param dict; tensor-parallel sharding is expressed once, as PartitionSpec
trees over those dicts (``parallel/shardings.py``), and applied by pjit —
the functions themselves stay single-device-pure and shard_map-compatible.
"""
