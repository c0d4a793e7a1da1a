"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip)."""

import os

# FORCE cpu (not setdefault): the environment often carries JAX_PLATFORMS=axon
# pointing at the real TPU tunnel; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import typesense_tpu.core.jaxcfg  # noqa: F401,E402

import pytest  # noqa: E402

# Tests measured >= ~5 s on the 1-core CI rig (mostly compile-heavy whole-
# engine scenarios). `pytest -m "not slow"` is the fast regression loop
# (target < 5 min); full runs still include them.
_SLOW = {
    "test_dense2_engine_parity_block_vs_direct", "test_clip_forward_parity",
    "test_compaction_parity_vs_whole_n",
    "test_dense_five_occurrence_proximity_exact", "test_dense_head_plane_path",
    "test_dense_matches_probe", "test_dense_sort_asc_no_pack2",
    "test_encoder_shapes_and_determinism",
    "test_highlight_covers_all_query_tokens_after_drop",
    "test_wide_matches_binary_random", "test_mesh_matches_single_device",
    "test_leader_kill_mid_import_convergence", "test_fused_path_parity",
    "test_param_acceptance_sweep", "test_manager_train_and_user_vector",
    "test_trained_tower_beats_mean_pooling", "test_phase_matrix",
    "test_batched_dense2_matches_solo", "test_drop_tokens_both_sides",
    "test_exclusion", "test_phrase_search",
    "test_words_present_dominates_everything", "test_exact_and_parity",
    "test_typo_prefix_faceted_parity", "test_repeating_token_ranking",
    "test_array_element_match_more_important_than_total_match",
    "test_array_match_across_elements_must_not_matter",
    "test_consider_dropped_tokens_during_text_match_scoring",
    "test_consider_dropped_tokens_during_text_match_scoring2",
    "test_cross_field_weight_not_augmented",
    "test_matched_segment_more_important_than_total_matches",
    "test_prefix_expansion_on_single_field",
    "test_prefix_expansion_when_exact_match_exists",
    "test_searching_for_minus_character",
    "test_verbatim_match_not_on_partial_token_match",
    "test_field_weighting_flips_order", "test_handle_large_weights",
    "test_multi_field_array_repeating_tokens",
    "test_single_field_token_count_words_far_apart",
    "test_single_hyphen_not_exclusion",
    "test_token_count_of_words_far_apart_multi_field",
    "test_tokens_spread_across_fields", "test_typo_before_drop_tokens",
    "test_custom_symbols_for_indexing", "test_prefix_only_on_last_token",
    "test_search_should_split_tokens", "test_japanese_bigram_phrase",
    "test_multiway_synonym_expands_both_directions",
    "test_synonym_inside_longer_query",
    "test_synonym_text_match_same_as_root_query",
    "test_max_score_prefers_best_field_score",
    "test_max_weight_prefers_heavy_field",
    "test_https_serving_and_chunked_import",
    "test_multi_token_position_priority",
    "test_held_out_transcription_accuracy", "test_whisper_transcribe_tiny",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy test (>=5s); excluded by -m 'not slow'")


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_executable_accumulation():
    """XLA:CPU segfaults inside backend_compile_and_load after ~600
    compile-heavy tests in one process (jaxlib 0.9; reproduced twice at the
    same suite position, passes in either half alone). Dropping compiled
    executables between modules keeps the process under the crash
    threshold; the persistent compilation cache makes re-tracing cheap."""
    yield
    import jax
    jax.clear_caches()


@pytest.fixture()
def tmp_store(tmp_path):
    from typesense_tpu.core.store import Store
    s = Store(str(tmp_path / "store"))
    yield s
    s.close()
