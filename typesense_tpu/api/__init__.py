"""typesense_tpu.api"""
