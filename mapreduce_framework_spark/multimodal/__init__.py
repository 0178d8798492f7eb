"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages.  The codec layer is STUBBED in this environment
(no image/audio libraries in the container) behind
:func:`mapreduce_framework_spark.multimodal.decode.decode_image_real`,
which raises ``NotImplementedError``; the Spark-side plumbing — schema,
partitioning, UDF signatures, batch shapes — is real and tested.
"""
