"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` operators.
The codec layer is stubbed (no image/audio libraries in this container) —
the Spark-side contracts (schemas, batching, partitioning) are real and
tested against deterministic fake decoders.
"""
