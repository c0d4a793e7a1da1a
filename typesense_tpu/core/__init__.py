"""typesense_tpu.core"""
