"""typesense_tpu.search"""
