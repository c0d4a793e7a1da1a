"""typesense_tpu.index"""
