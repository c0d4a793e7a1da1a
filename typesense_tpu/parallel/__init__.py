"""typesense_tpu.parallel"""
