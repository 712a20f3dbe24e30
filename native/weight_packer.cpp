// weight_packer — offline AWQ → engine `.bin` packer (C++17, no deps).
//
// The native stage-2 tool of the offline weight pipeline: reads the
// per-tensor raw dumps produced by tools/convert_awq_to_bin.py plus the
// HF config.json, repacks every AWQ w4-g128 projection into the engine's
// streaming-friendly flat checkpoint, and writes the 32-byte header +
// tensor walk consumed by llama_cu_awq_tpu.io.checkpoint.load_checkpoint.
//
// CLI-compatible with the reference's packer
// (/root/reference/weight_packer.cpp:235):
//   weight_packer <config.json> <input_dir> <output.bin> <old_format 0|1>
// and byte-identical to tools/pack_weights.py (the Python oracle the
// tests diff this binary against).
//
// File layout per quantized tensor, for a projection out = x @ W with
// n_in rows ("height") and n_out columns ("width"), group size 128:
//   qweight  uint32[n_out][ceil(n_in/32)*4]  nibble i of word y8 = row 8*y8+i
//   qzeros   uint32[n_out][ceil(g/8)]        same nibble packing over groups
//   scales   fp16  [n_out][g]                g = ceil(n_in/128)
// Padding words/nibbles are zero (deterministic, unlike the reference
// which leaves heap garbage in zero-point padding).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

constexpr int kGroupSize = 128;
// AWQ's nibble interleave: nibble j of a packed word belongs to logical
// column (8-block base + kAwqOrder[j]).
constexpr int kAwqOrder[8] = {0, 2, 4, 6, 1, 3, 5, 7};

int div_up(int a, int b) { return (a + b - 1) / b; }
int packed_height(int n) { return div_up(n, 32) * 4; }

// ---------------------------------------------------------------------
// config.json — minimal scanner for the seven numeric fields + rope_theta
// (same field set and defaults as the HF mapping in
// llama_cu_awq_tpu/io/awq.py config_from_hf_json).

struct ModelConfig {
  int32_t dim, hidden_dim, n_layers, n_heads, n_kv_heads, vocab_size, seq_len;
  float rope_theta;
};

bool json_number(const std::string& doc, const std::string& key, double* out) {
  const std::string needle = "\"" + key + "\"";
  size_t pos = 0;
  while ((pos = doc.find(needle, pos)) != std::string::npos) {
    size_t p = pos + needle.size();
    while (p < doc.size() && (std::isspace((unsigned char)doc[p]))) p++;
    if (p < doc.size() && doc[p] == ':') {
      p++;
      while (p < doc.size() && std::isspace((unsigned char)doc[p])) p++;
      char* end = nullptr;
      double v = std::strtod(doc.c_str() + p, &end);
      if (end != doc.c_str() + p) {
        *out = v;
        return true;
      }
    }
    pos += needle.size();
  }
  return false;
}

int json_int_required(const std::string& doc, const char* key) {
  double v;
  if (!json_number(doc, key, &v)) {
    fprintf(stderr, "error parsing config.json: %s not found\n", key);
    exit(1);
  }
  return (int)v;
}

ModelConfig parse_config(const std::string& doc) {
  ModelConfig c{};
  c.dim = json_int_required(doc, "hidden_size");
  c.hidden_dim = json_int_required(doc, "intermediate_size");
  c.n_layers = json_int_required(doc, "num_hidden_layers");
  c.n_heads = json_int_required(doc, "num_attention_heads");
  c.vocab_size = json_int_required(doc, "vocab_size");
  c.seq_len = json_int_required(doc, "max_position_embeddings");
  double v;
  c.n_kv_heads = json_number(doc, "num_key_value_heads", &v) ? (int)v
                                                             : c.n_heads;
  c.rope_theta = json_number(doc, "rope_theta", &v) ? (float)v : 10000.0f;
  return c;
}

// ---------------------------------------------------------------------
// IO helpers

std::vector<uint8_t> read_file(const std::string& path, size_t expect = 0) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    fprintf(stderr, "unable to open %s\n", path.c_str());
    exit(1);
  }
  size_t size = (size_t)f.tellg();
  if (expect && size < expect) {
    fprintf(stderr, "%s: expected %zu bytes, found %zu\n", path.c_str(),
            expect, size);
    exit(1);
  }
  std::vector<uint8_t> buf(expect ? expect : size);
  f.seekg(0);
  f.read((char*)buf.data(), (std::streamsize)buf.size());
  if (!f) {
    fprintf(stderr, "error reading %s\n", path.c_str());
    exit(1);
  }
  return buf;
}

class BinWriter {
 public:
  explicit BinWriter(const std::string& path) : f_(path, std::ios::binary) {
    if (!f_) {
      fprintf(stderr, "unable to open output file %s\n", path.c_str());
      exit(1);
    }
  }
  void write(const void* p, size_t bytes) {
    f_.write((const char*)p, (std::streamsize)bytes);
    if (!f_) {
      fprintf(stderr, "error writing output file\n");
      exit(1);
    }
  }
  void copy_file(const std::string& path, size_t bytes) {
    auto buf = read_file(path, bytes);
    write(buf.data(), bytes);
  }

 private:
  std::ofstream f_;
};

// ---------------------------------------------------------------------
// AWQ repack
//
// Old-format input packs 8 nibbles per uint32 along the OUTPUT (n_out)
// axis, row-major over n_in, interleaved by kAwqOrder. The engine layout
// packs 8 nibbles per uint32 along the INPUT (n_in) axis, column-major
// over n_out. One pass: decode each input word and scatter its 8 nibbles
// into the destination words.

std::vector<uint32_t> repack_awq_nibbles(const uint32_t* in, int height,
                                         int width, int out_rows) {
  std::vector<uint32_t> out((size_t)width * out_rows, 0u);
  const int wwords = width / 8;
  for (int y = 0; y < height; y++) {
    const uint32_t* row = in + (size_t)y * wwords;
    const int dst_word = y >> 3, dst_shift = 4 * (y & 7);
    for (int xw = 0; xw < wwords; xw++) {
      uint32_t w = row[xw];
      for (int j = 0; j < 8; j++, w >>= 4) {
        const int col = xw * 8 + kAwqOrder[j];
        out[(size_t)col * out_rows + dst_word] |= (w & 0xFu) << dst_shift;
      }
    }
  }
  return out;
}

struct QuantDims {
  int n_in, n_out, groups, out_qw_rows, out_qz_rows;
};

QuantDims quant_dims(int n_in, int n_out) {
  return {n_in, n_out, div_up(n_in, kGroupSize), packed_height(n_in),
          div_up(div_up(n_in, kGroupSize), 8)};
}

// Reads one projection's {qweight,qzeros,scales} dumps and streams the
// engine-layout triple into `out`.
void pack_projection(BinWriter& out, const std::string& base,
                     const QuantDims& d, bool old_format) {
  const auto qw_path = base + ".qweight.bin";
  const auto qz_path = base + ".qzeros.bin";
  const auto sc_path = base + ".scales.bin";

  if (old_format) {
    auto qw_raw = read_file(qw_path, (size_t)d.n_in * (d.n_out / 8) * 4);
    auto qw = repack_awq_nibbles((const uint32_t*)qw_raw.data(), d.n_in,
                                 d.n_out, d.out_qw_rows);
    out.write(qw.data(), qw.size() * 4);

    auto qz_raw = read_file(qz_path, (size_t)d.groups * (d.n_out / 8) * 4);
    auto qz = repack_awq_nibbles((const uint32_t*)qz_raw.data(), d.groups,
                                 d.n_out, d.out_qz_rows);
    out.write(qz.data(), qz.size() * 4);

    // scales: fp16 (groups, n_out) row-major -> (n_out, groups)
    auto sc_raw = read_file(sc_path, (size_t)d.groups * d.n_out * 2);
    const uint16_t* sc = (const uint16_t*)sc_raw.data();
    std::vector<uint16_t> sc_t((size_t)d.n_out * d.groups);
    for (int g = 0; g < d.groups; g++)
      for (int x = 0; x < d.n_out; x++)
        sc_t[(size_t)x * d.groups + g] = sc[(size_t)g * d.n_out + x];
    out.write(sc_t.data(), sc_t.size() * 2);
    return;
  }

  // new format: already engine layout; qweight/qzeros copy through
  // (zero-pad qweight rows up to ceil(n_in/32)*4 if the dump is the
  // unpadded ceil(n_in/8) height), scales lose their multiple-of-8
  // group padding.
  const int in_qw_rows = div_up(d.n_in, 8);
  auto qw_raw = read_file(qw_path, (size_t)d.n_out * in_qw_rows * 4);
  if (in_qw_rows == d.out_qw_rows) {
    out.write(qw_raw.data(), qw_raw.size());
  } else {
    const uint32_t* qw = (const uint32_t*)qw_raw.data();
    std::vector<uint32_t> padded((size_t)d.n_out * d.out_qw_rows, 0u);
    for (int x = 0; x < d.n_out; x++)
      memcpy(&padded[(size_t)x * d.out_qw_rows], qw + (size_t)x * in_qw_rows,
             (size_t)in_qw_rows * 4);
    out.write(padded.data(), padded.size() * 4);
  }
  out.copy_file(qz_path, (size_t)d.n_out * d.out_qz_rows * 4);

  const int padded_groups = d.out_qz_rows * 8;
  auto sc_raw = read_file(sc_path, (size_t)d.n_out * padded_groups * 2);
  const uint16_t* sc = (const uint16_t*)sc_raw.data();
  std::vector<uint16_t> sc_s((size_t)d.n_out * d.groups);
  for (int x = 0; x < d.n_out; x++)
    memcpy(&sc_s[(size_t)x * d.groups], sc + (size_t)x * padded_groups,
           (size_t)d.groups * 2);
  out.write(sc_s.data(), sc_s.size() * 2);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 5) {
    fprintf(stderr,
            "usage: weight_packer <config.json> <input_dir> <output.bin> "
            "<old_format: 0|1>\n");
    return 1;
  }
  const std::string config_path = argv[1], dir = argv[2], out_path = argv[3];
  const bool old_format = atoi(argv[4]) != 0;

  auto config_raw = read_file(config_path);
  ModelConfig cfg =
      parse_config(std::string(config_raw.begin(), config_raw.end()));
  printf("Model params:\n  dim %d  hidden_dim %d  n_layers %d  n_heads %d"
         "  n_kv_heads %d  vocab_size %d  seq_len %d  rope_theta %g\n",
         cfg.dim, cfg.hidden_dim, cfg.n_layers, cfg.n_heads, cfg.n_kv_heads,
         cfg.vocab_size, cfg.seq_len, (double)cfg.rope_theta);

  BinWriter out(out_path);
  static_assert(sizeof(ModelConfig) == 32, "header must be 32 bytes");
  out.write(&cfg, sizeof(cfg));

  const size_t fp16 = 2;
  out.copy_file(dir + "/model.embed_tokens.weight.bin",
                (size_t)cfg.vocab_size * cfg.dim * fp16);
  out.copy_file(dir + "/lm_head.weight.bin",
                (size_t)cfg.vocab_size * cfg.dim * fp16);
  out.copy_file(dir + "/model.norm.weight.bin", (size_t)cfg.dim * fp16);

  const int kv_dim = (cfg.dim * cfg.n_kv_heads) / cfg.n_heads;
  // (name, n_in, n_out) — projection walk in checkpoint order
  const struct {
    const char* name;
    int n_in, n_out;
  } projections[] = {
      {"self_attn.q_proj", cfg.dim, cfg.dim},
      {"self_attn.k_proj", cfg.dim, kv_dim},
      {"self_attn.v_proj", cfg.dim, kv_dim},
      {"self_attn.o_proj", cfg.dim, cfg.dim},
      {"mlp.up_proj", cfg.dim, cfg.hidden_dim},
      {"mlp.gate_proj", cfg.dim, cfg.hidden_dim},
      {"mlp.down_proj", cfg.hidden_dim, cfg.dim},
  };

  for (int layer = 0; layer < cfg.n_layers; layer++) {
    printf("packing layer %d/%d\r", layer + 1, cfg.n_layers);
    fflush(stdout);
    const std::string base = dir + "/model.layers." + std::to_string(layer);
    for (const auto& p : projections)
      pack_projection(out, base + "." + p.name, quant_dims(p.n_in, p.n_out),
                      old_format);
    out.copy_file(base + ".input_layernorm.weight.bin",
                  (size_t)cfg.dim * fp16);
    out.copy_file(base + ".post_attention_layernorm.weight.bin",
                  (size_t)cfg.dim * fp16);
  }
  printf("\nDone: %s\n", out_path.c_str());
  return 0;
}
