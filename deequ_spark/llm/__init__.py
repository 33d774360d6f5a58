"""LLM-data-pipeline operators (beyond the reference's surface, mandated by
BASELINE.json's north star): deduplication, similarity search, text
analysis, multimodal column plumbing — all expression-first DataFrame ops
designed for 100 TB scale."""

from .dedup import (deduplicate_exact, deduplicate_near,
                    duplicate_span_removal,
                    embedding_near_duplicates, exact_duplicates,
                    jaccard_similarity_pairs, minhash_lsh_pairs,
                    minhash_signatures, near_duplicate_components,
                    portable_shingle_hash, simhash, winnowing_candidates,
                    winnowing_fingerprints, word_ngrams,
                    simhash_near_duplicates, tune_band_shape,
                    char_shingles, word_shingles)
from .similarity import (brute_force_topk, cosine_similarity_expr,
                         semantic_decontaminate,
                         hyperplane_lsh_topk, ivf_assign, ivf_topk,
                         ivf_write_index, kmeans_centroids, knn_candidates,
                         knn_join)
from .text import (c4_line_clean, c4_page_flags, GOPHER_STOPWORDS, PII_PATTERNS, TRIGRAM_PROFILES,
                   char_trigram_model, char_trigrams, fingerprint,
                   gopher_quality_flags, language_id, lm_quality_score,
                   chunk_text, paragraph_dedup, remove_boilerplate_lines,
                   top_ngram_char_fraction,
                   language_id_trigrams, pii_counts, readability_scores, redact_pii, text_quality,
                   token_count_regex, token_count_whitespace, trigram_score,
                   decontaminate, mojibake_marker_count, ngram_novelty,
                   normalize_text)
from .urls import (canonicalize_url, extract_domain, url_dedup_stats,
                   url_deduplicate, url_quality_flags)
from .graph import (anchor_term_profile, anchor_texts,
                    extract_links, link_edges, pagerank)
from .sitemap import (discover_feeds, fetch_schedule, parse_feed,
                      parse_sitemap, sitemap_frontier)
from .html import (html_content_blocks, html_content_score,
                   html_documents, html_main_content, html_metadata,
                   html_to_text)
from .robots import (filter_disallowed, parse_robots,
                     parse_robots_directives, url_path)
from .shards import (read_webdataset, tar_members,
                     update_webdataset_index,
                     webdataset_index, write_webdataset)
from .vectors import (cosine_quantized, dequantize_embedding,
                      hashed_doc_vectors, quantize_embeddings)
from .warc import (build_warc_file, build_warc_record, crawl_to_corpus,
                   http_responses, parse_warc_files, read_warc,
                   read_warc_stream, surt_key, update_cdx_index,
                   warc_cdx_index,
                   wet_documents, write_wet)
from .classifier import score_quality, train_quality_classifier
from .incremental import (band_hashes, compact_dedup_index,
                           crawl_dedup_stream,
                          dedup_against_index, write_dedup_index)
from .phash import (audio_fingerprint_bytes, audio_fingerprints,
                    audio_near_duplicates,
                    average_hash_bytes, dhash_bytes, image_hashes,
                    image_near_duplicates)
from .multimodal import (attach_binary_payload, audio_features, decode_audio,
                         decode_image, encode_mp3_frames, encode_mp3_vbr,
                         encode_id3v2, encode_mp4_samples,
                         encode_mp4_skeleton, fake_resize,
                         gif_frame_features, id3_text_frames,
                         mp3_frame_profile, mp3_frames,
                         mp4_sample_profile, mp4_samples,
                         sample_video_keyframes,
                         parse_id3_frames,
                         probe_media, probe_media_features, resize_media,
                         extract_binary_features, sample_chunks,
                         sample_video_frames)
from .ffmpeg import ffmpeg_available, make_ffmpeg_frame_decoder
from .jpeg import decode_jpeg, encode_jpeg, encode_progressive_jpeg
from .gif import (decode_gif, decode_gif_frames, encode_gif,
                  encode_gif_animation)
from .pipeline import prepare_training_corpus
from .bpe import (bpe_decode_ids, bpe_encode_ids, bpe_encode_word,
                  bpe_token_count, bpe_vocab, train_bpe,
                  word_frequency_table)
from .search import (bm25_corpus_stats, bm25_topk, corpus_drift,
                     corpus_token_stats, token_frequencies, word_tokens)
from .semdedup import (assign_clusters, semantic_deduplicate,
                       semantic_duplicate_pairs)
from .packing import (apportion_quotas, assemble_packs, assign_split,
                      dsir_weights, hash_sample,
                      length_bucketize,
                      importance_sample, mixture_sample,
                      pack_sequences, pack_statistics,
                      token_mixture_sample,
                      portable_hash_hex, stratified_sample)
