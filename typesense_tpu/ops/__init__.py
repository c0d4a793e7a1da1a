"""typesense_tpu.ops"""
