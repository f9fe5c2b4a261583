"""Generate full-size torch-checkpoint key+shape manifests for the flagship
families (VERDICT r3 missing #2 / next #6).

Each generator emits {torch_key: [shape...]} exactly as the REAL published
checkpoint stores it — weight-norm (weight_g, weight_v) pairs, torch LSTM
l0/_reverse suffixes, (O, I, W) conv layouts, RVQ codebook EMA buffers,
old-style gamma/beta LayerNorms, position_ids artifacts — derived from the
reference implementation's consumption patterns (cited per rule), NOT from
this repo's sanitize() (which is the code under test).

tests/test_checkpoint_manifests.py loads these manifests, materializes
zero weights at the real shapes, runs each family's sanitize(), and asserts
(a) every model parameter the functional tree needs comes out with the
right shape and (b) every checkpoint key is consumed or deliberately
dropped — so the first real HF download loads first try.

Run: python tools/gen_checkpoint_manifests.py  (writes tests/manifests/*.json)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "manifests")


def _lstm(prefix, in_dim, hidden, m):
    """Torch bidirectional LSTM keys (reference kokoro.py:214-226 consumes
    exactly these suffixes)."""
    for suf, shape in (
            ("weight_ih_l0", (4 * hidden, in_dim)),
            ("weight_hh_l0", (4 * hidden, hidden)),
            ("bias_ih_l0", (4 * hidden,)),
            ("bias_hh_l0", (4 * hidden,)),
            ("weight_ih_l0_reverse", (4 * hidden, in_dim)),
            ("weight_hh_l0_reverse", (4 * hidden, hidden)),
            ("bias_ih_l0_reverse", (4 * hidden,)),
            ("bias_hh_l0_reverse", (4 * hidden,))):
        m[f"{prefix}.{suf}"] = list(shape)


def _wn_conv(prefix, out_ch, in_ch, k, m, bias=True):
    """weight_norm'd torch Conv1d: weight_g (O,1,1) + weight_v (O,I,W)
    (reference kokoro sanitize :203-209 folds these; our istftnet.py
    fold_weight_norm)."""
    m[f"{prefix}.weight_g"] = [out_ch, 1, 1]
    m[f"{prefix}.weight_v"] = [out_ch, in_ch, k]
    if bias:
        m[f"{prefix}.bias"] = [out_ch]


def _wn_tconv(prefix, in_ch, out_ch, k, m, bias=True, groups=1):
    """weight_norm'd torch ConvTranspose1d: weight (I, O/groups, W),
    weight_norm dim=0 -> g (I,1,1)."""
    m[f"{prefix}.weight_g"] = [in_ch, 1, 1]
    m[f"{prefix}.weight_v"] = [in_ch, out_ch // groups, k]
    if bias:
        m[f"{prefix}.bias"] = [out_ch]


def _conv(prefix, out_ch, in_ch, k, m, bias=True):
    m[f"{prefix}.weight"] = [out_ch, in_ch, k]
    if bias:
        m[f"{prefix}.bias"] = [out_ch]


def _linear(prefix, out_dim, in_dim, m, bias=True):
    m[f"{prefix}.weight"] = [out_dim, in_dim]
    if bias:
        m[f"{prefix}.bias"] = [out_dim]


def _ln(prefix, dim, m):
    m[f"{prefix}.weight"] = [dim]
    m[f"{prefix}.bias"] = [dim]


# ---------------------------------------------------------------------------
# Kokoro-82M — hexgrad/Kokoro-82M (StyleTTS2-derived .pth layout)
# reference consumption: kokoro.py:179-276 + istftnet Decoder.sanitize
# ---------------------------------------------------------------------------


def kokoro_manifest():
    m = {}
    # --- bert.* : PL-BERT = HF ALBERT naming under the 'bert.' prefix
    # (reference kokoro.py:185-191 passes them through; albert.py mirrors
    # transformers' AlbertModel tree). Real dims: hidden 768, 12 heads,
    # 1 group x 1 inner layer shared 12x, embedding_size 128, vocab 178.
    H, E, I, V, P = 768, 128, 2048, 178, 512
    m["bert.embeddings.position_ids"] = [1, P]          # dropped artifact
    m["bert.embeddings.word_embeddings.weight"] = [V, E]
    m["bert.embeddings.position_embeddings.weight"] = [P, E]
    m["bert.embeddings.token_type_embeddings.weight"] = [2, E]
    _ln("bert.embeddings.LayerNorm", E, m)
    _linear("bert.encoder.embedding_hidden_mapping_in", H, E, m)
    g = "bert.encoder.albert_layer_groups.0.albert_layers.0"
    for name in ("query", "key", "value"):
        _linear(f"{g}.attention.{name}", H, H, m)
    _linear(f"{g}.attention.dense", H, H, m)
    _ln(f"{g}.attention.LayerNorm", H, m)
    _linear(f"{g}.ffn", I, H, m)
    _linear(f"{g}.ffn_output", H, I, m)
    _ln(f"{g}.full_layer_layer_norm", H, m)
    _linear("bert.pooler", H, H, m)

    # --- bert_encoder: 768 -> 512 bottleneck linear (kokoro.py:193-194)
    D = 512
    _linear("bert_encoder", D, H, m)

    # --- text_encoder: embedding + 3x (weight-normed conv k5 + old-style
    # gamma/beta LayerNorm) + bidirectional LSTM (kokoro.py:196-228)
    m["text_encoder.embedding.weight"] = [V, D]
    for i in range(3):
        _wn_conv(f"text_encoder.cnn.{i}.0", D, D, 5, m)
        m[f"text_encoder.cnn.{i}.1.gamma"] = [D]
        m[f"text_encoder.cnn.{i}.1.beta"] = [D]
    _lstm("text_encoder.lstm", D, D // 2, m)

    # --- predictor (ProsodyPredictor, kokoro.py:229-267): DurationEncoder
    # (3 alternating LSTM/AdaLayerNorm), duration LSTM+proj, shared LSTM,
    # F0/N AdainResBlk1d towers + 1x1 proj convs
    S = 128
    for i in range(3):
        _lstm(f"predictor.text_encoder.lstms.{2 * i}", D + S, D // 2, m)
        _linear(f"predictor.text_encoder.lstms.{2 * i + 1}.fc", 2 * D, S, m)
    _lstm("predictor.lstm", D + S, D // 2, m)
    _linear("predictor.duration_proj.linear_layer", 50, D, m)  # max_dur
    _lstm("predictor.shared", D + S, D // 2, m)

    def adain_res_blk(prefix, dim_in, dim_out, upsample=False):
        _wn_conv(f"{prefix}.conv1", dim_out, dim_in, 3, m)
        _wn_conv(f"{prefix}.conv2", dim_out, dim_out, 3, m)
        _linear(f"{prefix}.norm1.fc", 2 * dim_in, S, m)
        _linear(f"{prefix}.norm2.fc", 2 * dim_out, S, m)
        if dim_in != dim_out:
            _wn_conv(f"{prefix}.conv1x1", dim_out, dim_in, 1, m, bias=False)
        if upsample:
            _wn_tconv(f"{prefix}.pool", dim_in, dim_in, 3, m, groups=dim_in)

    # F0/N towers: dims 512+... reference modules.py F0Ntrain blocks
    # (d_hid -> d_hid//2 over three blocks, first keeps width)
    adain_res_blk("predictor.F0.0", D, D)
    adain_res_blk("predictor.F0.1", D, D // 2, upsample=True)
    adain_res_blk("predictor.F0.2", D // 2, D // 2)
    adain_res_blk("predictor.N.0", D, D)
    adain_res_blk("predictor.N.1", D, D // 2, upsample=True)
    adain_res_blk("predictor.N.2", D // 2, D // 2)
    _conv("predictor.F0_proj", 1, D // 2, 1, m)
    _conv("predictor.N_proj", 1, D // 2, 1, m)

    # --- decoder (istftnet Decoder): encode/decode AdainResBlk1d chain,
    # F0/N downsample convs, asr residual 1x1, ISTFTNet generator
    BD, RD = 1024, 64
    adain_res_blk("decoder.encode", D + 2, BD)
    adain_res_blk("decoder.decode.0", BD + 2 + RD, BD)
    adain_res_blk("decoder.decode.1", BD + 2 + RD, BD)
    adain_res_blk("decoder.decode.2", BD + 2 + RD, BD)
    adain_res_blk("decoder.decode.3", BD + 2 + RD, 512, upsample=True)
    _wn_conv("decoder.F0_conv", 1, 1, 3, m)
    _wn_conv("decoder.N_conv", 1, 1, 3, m)
    _wn_conv("decoder.asr_res.0", RD, D, 1, m)

    # generator (reference istftnet.py:707-820): ups tconvs, 6 snake MRF
    # resblocks, noise convs/res per level, conv_post, NSF source linear
    U0, K0, U1, K1 = 10, 20, 6, 12
    _wn_tconv("decoder.generator.ups.0", 512, 256, K0, m)
    _wn_tconv("decoder.generator.ups.1", 256, 128, K1, m)
    n_fft, hop = 20, 5
    for i, ch in ((0, 256), (1, 128)):
        if i == 0:
            stride_f0 = U1
            _conv(f"decoder.generator.noise_convs.{i}", ch, n_fft + 2,
                  stride_f0 * 2, m)
            nk = 7
        else:
            _conv(f"decoder.generator.noise_convs.{i}", ch, n_fft + 2, 1, m)
            nk = 11
        nr = f"decoder.generator.noise_res.{i}"
        for j, dil in enumerate((1, 3, 5)):
            _wn_conv(f"{nr}.convs1.{j}", ch, ch, nk, m)
            _wn_conv(f"{nr}.convs2.{j}", ch, ch, nk, m)
            m[f"{nr}.adain1.{j}.fc.weight"] = [2 * ch, S]
            m[f"{nr}.adain1.{j}.fc.bias"] = [2 * ch]
            m[f"{nr}.adain2.{j}.fc.weight"] = [2 * ch, S]
            m[f"{nr}.adain2.{j}.fc.bias"] = [2 * ch]
            m[f"{nr}.alpha1.{j}"] = [1, ch, 1]
            m[f"{nr}.alpha2.{j}"] = [1, ch, 1]
    for i, ch in ((0, 256), (1, 128)):
        for j, k in enumerate((3, 7, 11)):
            rb = f"decoder.generator.resblocks.{i * 3 + j}"
            for jj, dil in enumerate((1, 3, 5)):
                _wn_conv(f"{rb}.convs1.{jj}", ch, ch, k, m)
                _wn_conv(f"{rb}.convs2.{jj}", ch, ch, k, m)
                m[f"{rb}.adain1.{jj}.fc.weight"] = [2 * ch, S]
                m[f"{rb}.adain1.{jj}.fc.bias"] = [2 * ch]
                m[f"{rb}.adain2.{jj}.fc.weight"] = [2 * ch, S]
                m[f"{rb}.adain2.{jj}.fc.bias"] = [2 * ch]
                m[f"{rb}.alpha1.{jj}"] = [1, ch, 1]
                m[f"{rb}.alpha2.{jj}"] = [1, ch, 1]
    _wn_conv("decoder.generator.conv_post", n_fft + 2, 128, 7, m)
    _linear("decoder.generator.m_source.l_linear", 1, 9, m)
    return m


# ---------------------------------------------------------------------------
# Whisper large-v3-turbo — openai/whisper-large-v3-turbo (HF transformers
# safetensors layout). Reference consumption: whisper sanitize remaps
# model.{encoder,decoder}.layers.* -> blocks.* (reference whisper.py:539-607);
# dims: d_model 1280, 32 enc / 4 dec layers, 20 heads, vocab 51866, 128 mels.
# ---------------------------------------------------------------------------


def whisper_turbo_manifest():
    m = {}
    D, V, MELS, ECTX, TCTX = 1280, 51866, 128, 1500, 448
    N_ENC, N_DEC = 32, 4

    def _attn(prefix, cross=False):
        # HF whisper: k_proj has no bias (torch nn.Linear(bias=False))
        _linear(f"{prefix}.q_proj", D, D, m)
        m[f"{prefix}.k_proj.weight"] = [D, D]
        _linear(f"{prefix}.v_proj", D, D, m)
        _linear(f"{prefix}.out_proj", D, D, m)

    m["model.encoder.conv1.weight"] = [D, MELS, 3]
    m["model.encoder.conv1.bias"] = [D]
    m["model.encoder.conv2.weight"] = [D, D, 3]
    m["model.encoder.conv2.bias"] = [D]
    m["model.encoder.embed_positions.weight"] = [ECTX, D]  # dropped (sinusoids)
    for i in range(N_ENC):
        p = f"model.encoder.layers.{i}"
        _attn(f"{p}.self_attn")
        _ln(f"{p}.self_attn_layer_norm", D, m)
        _linear(f"{p}.fc1", 4 * D, D, m)
        _linear(f"{p}.fc2", D, 4 * D, m)
        _ln(f"{p}.final_layer_norm", D, m)
    _ln("model.encoder.layer_norm", D, m)

    m["model.decoder.embed_tokens.weight"] = [V, D]
    m["model.decoder.embed_positions.weight"] = [TCTX, D]
    for i in range(N_DEC):
        p = f"model.decoder.layers.{i}"
        _attn(f"{p}.self_attn")
        _ln(f"{p}.self_attn_layer_norm", D, m)
        _attn(f"{p}.encoder_attn", cross=True)
        _ln(f"{p}.encoder_attn_layer_norm", D, m)
        _linear(f"{p}.fc1", 4 * D, D, m)
        _linear(f"{p}.fc2", D, 4 * D, m)
        _ln(f"{p}.final_layer_norm", D, m)
    _ln("model.decoder.layer_norm", D, m)
    # proj_out is tied to embed_tokens and not serialized in the published
    # safetensors; sanitize drops it if a converted copy carries one.
    return m


# ---------------------------------------------------------------------------
# Qwen3-TTS (1.7B-class talker) — published layout: main safetensors carries
# talker.* + speaker_encoder.*; the codec lives in a speech_tokenizer/
# subfolder (own config.json + safetensors with decoder.* / encoder.* keys,
# loaded by reference qwen3_tts.py:2850 post_load_hook; our loader merges it
# via Model.WEIGHT_SUBDIRS). Dims = reference config.py defaults (the
# published model's values). Module trees: reference talker.py:228-800,
# speech_tokenizer.py:32-960, speaker_encoder.py:29-270.
# ---------------------------------------------------------------------------


def _rms(prefix, dim, m):
    m[f"{prefix}.weight"] = [dim]


def _qwen3_layer(prefix, m, hidden, n_heads, n_kv, head_dim, inter,
                 qk_norm=True):
    a = f"{prefix}.self_attn"
    m[f"{a}.q_proj.weight"] = [n_heads * head_dim, hidden]
    m[f"{a}.k_proj.weight"] = [n_kv * head_dim, hidden]
    m[f"{a}.v_proj.weight"] = [n_kv * head_dim, hidden]
    m[f"{a}.o_proj.weight"] = [hidden, n_heads * head_dim]
    if qk_norm:
        _rms(f"{a}.q_norm", head_dim, m)
        _rms(f"{a}.k_norm", head_dim, m)
    m[f"{prefix}.mlp.gate_proj.weight"] = [inter, hidden]
    m[f"{prefix}.mlp.up_proj.weight"] = [inter, hidden]
    m[f"{prefix}.mlp.down_proj.weight"] = [hidden, inter]
    _rms(f"{prefix}.input_layernorm", hidden, m)
    _rms(f"{prefix}.post_attention_layernorm", hidden, m)


def qwen3_tts_main_manifest(cfg=None):
    """Parameterized by ModelConfig so the same generator emits both the
    published full-size manifest (defaults) and tiny-dims checkpoints for
    the on-disk loader-roundtrip test."""
    from mlx_audio_tpu.tts.models.qwen3_tts.config import ModelConfig

    if cfg is None:
        cfg = ModelConfig()
    t = cfg.talker_config
    m = {}
    H, NH, NKV, HD = (t.hidden_size, t.num_attention_heads,
                      t.num_key_value_heads, t.head_dim)
    I, L, V = t.intermediate_size, t.num_hidden_layers, t.vocab_size
    TV, TH = t.text_vocab_size, t.text_hidden_size
    m["talker.model.codec_embedding.weight"] = [V, H]
    m["talker.model.text_embedding.weight"] = [TV, TH]
    for i in range(L):
        _qwen3_layer(f"talker.model.layers.{i}", m, H, NH, NKV, HD, I)
    _rms("talker.model.norm", H, m)
    _linear("talker.text_projection.linear_fc1", TH, TH, m)
    _linear("talker.text_projection.linear_fc2", H, TH, m)
    m["talker.codec_head.weight"] = [V, H]
    # code predictor: per-group embeddings + heads for groups 1..G-1
    # (num_code_groups total; group 0 comes from the talker itself)
    cp = t.code_predictor_config
    CPH = cp.hidden_size
    CPL, CPV, G1 = cp.num_hidden_layers, cp.vocab_size, t.num_code_groups - 1
    for g in range(G1):
        m[f"talker.code_predictor.model.codec_embedding.{g}.weight"] = [
            CPV, CPH]
    for i in range(CPL):
        _qwen3_layer(f"talker.code_predictor.model.layers.{i}", m, CPH,
                     cp.num_attention_heads, cp.num_key_value_heads,
                     cp.head_dim, cp.intermediate_size)
    _rms("talker.code_predictor.model.norm", CPH, m)
    for g in range(G1):
        m[f"talker.code_predictor.lm_head.{g}.weight"] = [CPV, CPH]

    # --- speaker encoder (ECAPA-TDNN, reference speaker_encoder.py:220-270)
    se = cfg.speaker_encoder_config
    MEL, CH, KS = se.mel_dim, list(se.enc_channels), list(se.enc_kernel_sizes)
    ATT, SCALE, SE, ENC = (se.enc_attention_channels, se.enc_res2net_scale,
                           se.enc_se_channels, se.enc_dim)
    P = "speaker_encoder"
    _conv(f"{P}.blocks.0.conv", CH[0], MEL, KS[0], m)
    for i in range(1, len(CH) - 1):
        b = f"{P}.blocks.{i}"
        _conv(f"{b}.tdnn1.conv", CH[i], CH[i - 1], 1, m)
        for j in range(SCALE - 1):
            _conv(f"{b}.res2net_block.blocks.{j}.conv", CH[i] // SCALE,
                  CH[i] // SCALE, KS[i], m)
        _conv(f"{b}.tdnn2.conv", CH[i], CH[i], 1, m)
        _conv(f"{b}.se_block.conv1", SE, CH[i], 1, m)
        _conv(f"{b}.se_block.conv2", CH[i], SE, 1, m)
    mfa_in = sum(CH[1:-1])
    _conv(f"{P}.mfa.conv", CH[-1], mfa_in, KS[-1], m)
    _conv(f"{P}.asp.tdnn.conv", ATT, CH[-1] * 3, 1, m)
    _conv(f"{P}.asp.conv", CH[-1], ATT, 1, m)
    _conv(f"{P}.fc", ENC, CH[-1] * 2, 1, m)
    return m


def qwen3_tts_speech_tokenizer_manifest(cfg=None, include_encoder=True):
    """Keys of speech_tokenizer/*.safetensors (decoder.* + encoder.*).

    `include_encoder=False` skips the HF-mimi ICL encoder group (its dims
    come from the fixed published mimi config, not the decoder config) —
    used by the tiny-dims loader-roundtrip test."""
    from mlx_audio_tpu.tts.models.qwen3_tts.config import ModelConfig

    if cfg is None:
        cfg = ModelConfig()
    d = cfg.tokenizer_config.decoder_config
    m = {}
    # --- decoder (reference speech_tokenizer.py:786-880)
    LAT, HID, INTER, DL = (d.latent_dim, d.hidden_size, d.intermediate_size,
                           d.num_hidden_layers)
    NH, NKV, HD = (d.num_attention_heads, d.num_key_value_heads, d.head_dim)
    DEC, CBD, CB = d.decoder_dim, d.codebook_dim, d.codebook_size
    D = "decoder"
    _linear(f"{D}.pre_transformer.input_proj", HID, LAT, m)
    _linear(f"{D}.pre_transformer.output_proj", LAT, HID, m)
    for i in range(DL):
        p = f"{D}.pre_transformer.layers.{i}"
        _qwen3_layer(p, m, HID, NH, NKV, HD, INTER, qk_norm=False)
        m[f"{p}.self_attn_layer_scale.scale"] = [HID]
        m[f"{p}.mlp_layer_scale.scale"] = [HID]
    _rms(f"{D}.pre_transformer.norm", HID, m)
    # split RVQ: vector dim codebook_dim//2, semantic + acoustic splits
    QD = CBD // 2
    for rvq, n_q in (("rvq_first", d.num_semantic_quantizers),
                     ("rvq_rest", d.num_quantizers
                      - d.num_semantic_quantizers)):
        q = f"{D}.quantizer.{rvq}"
        m[f"{q}.input_proj.weight"] = [QD, CBD, 1]
        m[f"{q}.output_proj.weight"] = [CBD, QD, 1]
        for i in range(n_q):
            cb = f"{q}.vq.layers.{i}._codebook"
            m[f"{cb}.embedding_sum"] = [CB, QD]
            m[f"{cb}.cluster_usage"] = [CB]
    _conv(f"{D}.pre_conv.conv", LAT, CBD, 3, m)
    for i, factor in enumerate(d.upsampling_ratios):
        u = f"{D}.upsample.{i}"
        m[f"{u}.0.conv.weight"] = [LAT, LAT, factor * 2]  # tconv (I, O, K)
        m[f"{u}.0.conv.bias"] = [LAT]
        cnb = f"{u}.1"
        m[f"{cnb}.dwconv.conv.weight"] = [LAT, 1, 7]      # depthwise
        m[f"{cnb}.dwconv.conv.bias"] = [LAT]
        _ln(f"{cnb}.norm", LAT, m)
        _linear(f"{cnb}.pwconv1", 4 * LAT, LAT, m)
        _linear(f"{cnb}.pwconv2", LAT, 4 * LAT, m)
        m[f"{cnb}.gamma"] = [LAT]
    _conv(f"{D}.decoder.0.conv", DEC, LAT, 7, m)
    for li, rate in enumerate(d.upsample_rates):
        in_d = DEC // (2 ** li)
        out_d = DEC // (2 ** (li + 1))
        b = f"{D}.decoder.{li + 1}.block"
        m[f"{b}.0.alpha"] = [in_d]
        m[f"{b}.0.beta"] = [in_d]
        m[f"{b}.1.conv.weight"] = [in_d, out_d, rate * 2]  # tconv (I, O, K)
        m[f"{b}.1.conv.bias"] = [out_d]
        for j in ("2", "3", "4"):
            r = f"{b}.{j}"
            m[f"{r}.act1.alpha"] = [out_d]
            m[f"{r}.act1.beta"] = [out_d]
            _conv(f"{r}.conv1.conv", out_d, out_d, 7, m)
            m[f"{r}.act2.alpha"] = [out_d]
            m[f"{r}.act2.beta"] = [out_d]
            _conv(f"{r}.conv2.conv", out_d, out_d, 1, m)
    n_up = len(d.upsample_rates)
    out_d = DEC // (2 ** n_up)
    m[f"{D}.decoder.{n_up + 1}.alpha"] = [out_d]
    m[f"{D}.decoder.{n_up + 1}.beta"] = [out_d]
    _conv(f"{D}.decoder.{n_up + 2}.conv", 1, out_d, 7, m)
    if not include_encoder:
        return m

    # --- encoder (HF mimi-style, consumed by _sanitize_ref_encoder;
    # reference speech_tokenizer.py:1262-1390). SEANet downsample order is
    # reversed(upsampling_ratios) = 4,5,6,8; residual block before each.
    E, NF, EH, EI, EL = "encoder", 64, 512, 2048, 8
    m[f"{E}.encoder.layers.0.conv.weight"] = [NF, 1, 7]
    m[f"{E}.encoder.layers.0.conv.bias"] = [NF]
    n_res = {1: NF, 4: 2 * NF, 7: 4 * NF, 10: 8 * NF}
    for n, ch in n_res.items():
        m[f"{E}.encoder.layers.{n}.block.1.conv.weight"] = [ch // 2, ch, 3]
        m[f"{E}.encoder.layers.{n}.block.1.conv.bias"] = [ch // 2]
        m[f"{E}.encoder.layers.{n}.block.3.conv.weight"] = [ch, ch // 2, 1]
        m[f"{E}.encoder.layers.{n}.block.3.conv.bias"] = [ch]
    for n, (ch, ratio) in {3: (NF, 4), 6: (2 * NF, 5), 9: (4 * NF, 6),
                           12: (8 * NF, 8)}.items():
        m[f"{E}.encoder.layers.{n}.conv.weight"] = [2 * ch, ch, ratio * 2]
        m[f"{E}.encoder.layers.{n}.conv.bias"] = [2 * ch]
    m[f"{E}.encoder.layers.14.conv.weight"] = [EH, 16 * NF, 3]
    m[f"{E}.encoder.layers.14.conv.bias"] = [EH]
    for i in range(EL):
        p = f"{E}.encoder_transformer.layers.{i}"
        m[f"{p}.self_attn.q_proj.weight"] = [EH, EH]
        m[f"{p}.self_attn.k_proj.weight"] = [EH, EH]
        m[f"{p}.self_attn.v_proj.weight"] = [EH, EH]
        m[f"{p}.self_attn.o_proj.weight"] = [EH, EH]
        m[f"{p}.mlp.fc1.weight"] = [EI, EH]
        m[f"{p}.mlp.fc2.weight"] = [EH, EI]
        _ln(f"{p}.input_layernorm", EH, m)
        _ln(f"{p}.post_attention_layernorm", EH, m)
        m[f"{p}.self_attn_layer_scale.scale"] = [EH]
        m[f"{p}.mlp_layer_scale.scale"] = [EH]
    m[f"{E}.downsample.conv.weight"] = [EH, EH, 4]  # stride-2, bias-free
    VQD, VCB = 256, 2048
    for rvq, n_q in (("semantic_residual_vector_quantizer", 1),
                     ("acoustic_residual_vector_quantizer", 31)):
        q = f"{E}.quantizer.{rvq}"
        m[f"{q}.input_proj.weight"] = [VQD, EH, 1]
        m[f"{q}.output_proj.weight"] = [EH, VQD, 1]
        for i in range(n_q):
            cb = f"{q}.layers.{i}.codebook"
            m[f"{cb}.embed_sum"] = [VCB, VQD]
            m[f"{cb}.cluster_usage"] = [VCB]
            m[f"{cb}.initialized"] = [1]
    return m


def qwen3_tts_manifest():
    """Nested: per-file-group keys exactly as published; the test applies
    the loader's WEIGHT_SUBDIRS prefix rule to the subfolder group."""
    return {
        "main": qwen3_tts_main_manifest(),
        "subdirs": {"speech_tokenizer": qwen3_tts_speech_tokenizer_manifest()},
    }


# ---------------------------------------------------------------------------
# Higgs Audio v2 3B — bosonai/higgs-audio-v2-generation-3B-base.
# The reference's sanitize is a pass-through (reference higgs_audio.py:257-264:
# "Higgs's safetensors already use HuggingFace Llama naming with the
# Higgs-specific audio_* additions"), so the published keys ARE the module
# tree: bare (no 'model.' prefix) Llama layers with dual-FFN audio_* variants
# on every layer (config.py:54-56: all 28), plus codebook embeddings and the
# two projector heads. tie_word_embeddings=True (config.py:29) — the text head
# is tied to embed_tokens and not serialized.
# ---------------------------------------------------------------------------


def higgs_v2_manifest(cfg=None):
    from mlx_audio_tpu.tts.models.higgs_audio.higgs_audio import ModelConfig

    if cfg is None:
        cfg = ModelConfig()
    t = cfg.text
    m = {}
    H, I, V = t.hidden_size, t.intermediate_size, t.vocab_size
    hd = t.head_dim
    m["embed_tokens.weight"] = [V, H]
    m["audio_codebook_embeddings.weight"] = [
        cfg.audio_num_codebooks * cfg.stride, H]
    for i in range(t.num_hidden_layers):
        p = f"layers.{i}"
        _rms(f"{p}.input_layernorm", H, m)
        _rms(f"{p}.audio_input_layernorm", H, m)
        m[f"{p}.self_attn.q_proj.weight"] = [t.num_attention_heads * hd, H]
        m[f"{p}.self_attn.k_proj.weight"] = [t.num_key_value_heads * hd, H]
        m[f"{p}.self_attn.v_proj.weight"] = [t.num_key_value_heads * hd, H]
        m[f"{p}.self_attn.o_proj.weight"] = [H, t.num_attention_heads * hd]
        _rms(f"{p}.post_attention_layernorm", H, m)
        _rms(f"{p}.audio_post_attention_layernorm", H, m)
        for mlp in ("mlp", "audio_mlp"):
            m[f"{p}.{mlp}.gate_proj.weight"] = [I, H]
            m[f"{p}.{mlp}.up_proj.weight"] = [I, H]
            m[f"{p}.{mlp}.down_proj.weight"] = [H, I]
    _rms("norm", H, m)
    # text_lm_head is TIED (absent from the file); audio head is real
    m["audio_decoder_proj.audio_lm_head.weight"] = [
        cfg.audio_num_codebooks * cfg.stride, H]
    return m


# ---------------------------------------------------------------------------
# Higgs Audio v3 4B — published layout uses 'tied.'/'body.' prefixes that the
# reference remaps (reference higgs_audio_v3/model.py:111-133): Qwen3-style
# backbone (q/k/norm per layer) under body.layers.*, text embedding + fused
# audio codebook table under tied.embedding.*, tied.head.* dropped.
# ---------------------------------------------------------------------------


def higgs_v3_manifest(cfg=None):
    from mlx_audio_tpu.tts.models.higgs_audio_v3.higgs_audio_v3 import (
        ModelConfig)

    if cfg is None:
        cfg = ModelConfig()
    t = cfg.text_config
    m = {}
    H, I, hd = t.hidden_size, t.intermediate_size, t.head_dim
    m["tied.embedding.text_embedding.weight"] = [t.vocab_size, H]
    m["tied.embedding.modality_embeddings.0.embedding.weight"] = [
        cfg.audio_num_codebooks * cfg.audio_codebook_size, H]
    # dropped groups the reference skips explicitly (model.py:126-131)
    m["tied.head.weight"] = [t.vocab_size, H]
    for i in range(t.num_hidden_layers):
        p = f"body.layers.{i}"
        m[f"{p}.self_attn.q_proj.weight"] = [t.num_attention_heads * hd, H]
        m[f"{p}.self_attn.k_proj.weight"] = [t.num_key_value_heads * hd, H]
        m[f"{p}.self_attn.v_proj.weight"] = [t.num_key_value_heads * hd, H]
        m[f"{p}.self_attn.o_proj.weight"] = [H, t.num_attention_heads * hd]
        _rms(f"{p}.self_attn.q_norm", hd, m)
        _rms(f"{p}.self_attn.k_norm", hd, m)
        m[f"{p}.mlp.gate_proj.weight"] = [I, H]
        m[f"{p}.mlp.up_proj.weight"] = [I, H]
        m[f"{p}.mlp.down_proj.weight"] = [H, I]
        _rms(f"{p}.input_layernorm", H, m)
        _rms(f"{p}.post_attention_layernorm", H, m)
    _rms("body.norm", H, m)
    return m


# ---------------------------------------------------------------------------
# Voxtral Realtime — mistralai consolidated.safetensors layout (reference
# voxtral_realtime.py:474-557): whisper-style encoder with selective biases
# (encoder.py:57-61: wq/wv/wo yes, wk no; w2 only in FFN) under
# mm_streams_embeddings.embedding_module.whisper_encoder.*, bias-free GQA
# decoder (decoder.py:89-92) under bare layers.*, tied tok_embeddings.
# ---------------------------------------------------------------------------


def voxtral_realtime_manifest(cfg=None):
    from mlx_audio_tpu.stt.models.voxtral_realtime.voxtral_realtime import (
        ModelConfig)

    if cfg is None:
        cfg = ModelConfig()
    e, d, a = cfg.encoder_args, cfg.decoder, cfg.audio_encoding_args
    m = {}
    ENC = "mm_streams_embeddings.embedding_module.whisper_encoder"
    AD = "mm_streams_embeddings.embedding_module"
    _conv(f"{ENC}.conv_layers.0.conv", e.dim, a.num_mel_bins, 3, m)
    _conv(f"{ENC}.conv_layers.1.conv", e.dim, e.dim, 3, m)
    attn_dim = e.n_heads * e.head_dim
    for i in range(e.n_layers):
        p = f"{ENC}.transformer.layers.{i}"
        _rms(f"{p}.attention_norm", e.dim, m)
        _linear(f"{p}.attention.wq", attn_dim, e.dim, m)
        m[f"{p}.attention.wk.weight"] = [attn_dim, e.dim]
        _linear(f"{p}.attention.wv", attn_dim, e.dim, m)
        _linear(f"{p}.attention.wo", e.dim, attn_dim, m)
        _rms(f"{p}.ffn_norm", e.dim, m)
        m[f"{p}.feed_forward.w1.weight"] = [e.hidden_dim, e.dim]
        m[f"{p}.feed_forward.w3.weight"] = [e.hidden_dim, e.dim]
        _linear(f"{p}.feed_forward.w2", e.dim, e.hidden_dim, m)
    _rms(f"{ENC}.transformer.norm", e.dim, m)
    m[f"{AD}.audio_language_projection.0.weight"] = [
        d.dim, e.dim * e.downsample_factor]
    m[f"{AD}.audio_language_projection.2.weight"] = [d.dim, d.dim]
    m[f"{AD}.tok_embeddings.weight"] = [d.vocab_size, d.dim]
    q_dim, kv_dim = d.n_heads * d.head_dim, d.n_kv_heads * d.head_dim
    for i in range(d.n_layers):
        p = f"layers.{i}"
        _rms(f"{p}.attention_norm", d.dim, m)
        m[f"{p}.attention.wq.weight"] = [q_dim, d.dim]
        m[f"{p}.attention.wk.weight"] = [kv_dim, d.dim]
        m[f"{p}.attention.wv.weight"] = [kv_dim, d.dim]
        m[f"{p}.attention.wo.weight"] = [d.dim, q_dim]
        _rms(f"{p}.ffn_norm", d.dim, m)
        m[f"{p}.feed_forward.w1.weight"] = [d.hidden_dim, d.dim]
        m[f"{p}.feed_forward.w3.weight"] = [d.hidden_dim, d.dim]
        m[f"{p}.feed_forward.w2.weight"] = [d.dim, d.hidden_dim]
        m[f"{p}.ada_rms_norm_t_cond.0.weight"] = [
            d.ada_rms_norm_t_cond_dim, d.dim]
        m[f"{p}.ada_rms_norm_t_cond.2.weight"] = [
            d.dim, d.ada_rms_norm_t_cond_dim]
    m["norm.weight"] = [d.dim]
    return m


GENERATORS = {
    "kokoro": kokoro_manifest,
    "whisper_large_v3_turbo": whisper_turbo_manifest,
    "qwen3_tts": qwen3_tts_manifest,
    "higgs_audio_v2": higgs_v2_manifest,
    "higgs_audio_v3": higgs_v3_manifest,
    "voxtral_realtime": voxtral_realtime_manifest,
}


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    only = sys.argv[1:] or list(GENERATORS)
    for name in only:
        m = GENERATORS[name]()
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(m, f, indent=0, sort_keys=True)
        print(f"{name}: {len(m)} keys -> {path}")


if __name__ == "__main__":
    main()
