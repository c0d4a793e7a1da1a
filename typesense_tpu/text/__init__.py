"""typesense_tpu.text"""
