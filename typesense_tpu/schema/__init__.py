"""typesense_tpu.schema"""
