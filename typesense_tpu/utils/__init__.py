"""typesense_tpu.utils"""
