// Permutohedral-lattice dense-CRF mean-field inference (from scratch).
//
// The reference pipeline's only native dependency is pydensecrf (Krähenbühl's
// C++ permutohedral lattice). This is an independent implementation of the
// same published algorithm (Adams et al. 2010 lattice; Krähenbühl & Koltun
// NIPS'11 mean field) providing a host-side cross-check for the framework's
// on-device dense CRF, exposed through a minimal C API for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC permutohedral_crf.cpp -o libpermutocrf.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Hash for lattice keys (d int16 coordinates).
struct KeyHash {
    size_t operator()(const std::vector<short>& k) const {
        size_t h = 14695981039346656037ULL;
        for (short v : k) {
            h ^= (size_t)(uint16_t)v;
            h *= 1099511628211ULL;
        }
        return h;
    }
};

class Permutohedral {
  public:
    // features: [n, d] row-major
    void init(const float* features, int n, int d) {
        n_ = n;
        d_ = d;
        offsets_.assign((size_t)n * (d + 1), 0);
        weights_.assign((size_t)n * (d + 1), 0.f);

        std::unordered_map<std::vector<short>, int, KeyHash> table;
        table.reserve((size_t)n * (d + 1));

        std::vector<float> elevated(d + 1);
        std::vector<float> rem0(d + 1);
        std::vector<int> rank(d + 1);
        std::vector<float> barycentric(d + 2);
        std::vector<short> key(d);

        // Elevation matrix scale factors.
        std::vector<float> scale_factor(d);
        const float inv_std_dev = std::sqrt(2.f / 3.f) * (d + 1);
        for (int i = 0; i < d; i++)
            scale_factor[i] = inv_std_dev / std::sqrt((float)(i + 1) * (i + 2));

        for (int i = 0; i < n; i++) {
            const float* f = features + (size_t)i * d;
            // Elevate into the hyperplane sum(x)=0 (E matrix applied directly).
            float sm = 0.f;
            for (int j = d; j > 0; j--) {
                float cf = f[j - 1] * scale_factor[j - 1];
                elevated[j] = sm - j * cf;
                sm += cf;
            }
            elevated[0] = sm;

            // Closest zero-colored lattice point.
            const float down_factor = 1.f / (d + 1);
            const float up_factor = (float)(d + 1);
            int sum = 0;
            for (int j = 0; j <= d; j++) {
                float v = elevated[j] * down_factor;
                float up = std::ceil(v) * up_factor;
                float down = std::floor(v) * up_factor;
                rem0[j] = (up - elevated[j] < elevated[j] - down) ? up : down;
                sum += (int)(rem0[j] * down_factor);
            }

            // Rank differential coordinates.
            for (int j = 0; j <= d; j++) rank[j] = 0;
            for (int j = 0; j < d; j++) {
                double dj = elevated[j] - rem0[j];
                for (int k = j + 1; k <= d; k++) {
                    double dk = elevated[k] - rem0[k];
                    if (dj < dk) rank[j]++;
                    else rank[k]++;
                }
            }
            // Walk back onto the hyperplane if sum != 0.
            for (int j = 0; j <= d; j++) {
                rank[j] += sum;
                if (rank[j] < 0) {
                    rank[j] += d + 1;
                    rem0[j] += d + 1;
                } else if (rank[j] > d) {
                    rank[j] -= d + 1;
                    rem0[j] -= d + 1;
                }
            }

            // Barycentric coordinates.
            std::fill(barycentric.begin(), barycentric.end(), 0.f);
            for (int j = 0; j <= d; j++) {
                float v = (elevated[j] - rem0[j]) * down_factor;
                barycentric[d - rank[j]] += v;
                barycentric[d - rank[j] + 1] -= v;
            }
            barycentric[0] += 1.f + barycentric[d + 1];

            // Register the d+1 simplex vertices.
            for (int remainder = 0; remainder <= d; remainder++) {
                for (int j = 0; j < d; j++) {
                    key[j] = (short)(rem0[j] + remainder);
                    if (rank[j] > d - remainder) key[j] -= (short)(d + 1);
                }
                auto it = table.find(key);
                int idx;
                if (it == table.end()) {
                    idx = (int)keys_.size();
                    table.emplace(key, idx);
                    keys_.push_back(key);
                } else {
                    idx = it->second;
                }
                offsets_[(size_t)i * (d + 1) + remainder] = idx;
                weights_[(size_t)i * (d + 1) + remainder] = barycentric[remainder];
            }
        }
        m_ = (int)keys_.size();

        // Precompute blur neighbors along each lattice direction.
        blur_n1_.assign((size_t)(d + 1) * m_, -1);
        blur_n2_.assign((size_t)(d + 1) * m_, -1);
        std::vector<short> np1(d), np2(d);
        for (int j = 0; j <= d; j++) {
            for (int i = 0; i < m_; i++) {
                const std::vector<short>& k = keys_[i];
                for (int t = 0; t < d; t++) {
                    np1[t] = (short)(k[t] + 1);
                    np2[t] = (short)(k[t] - 1);
                }
                if (j < d) {
                    np1[j] = (short)(k[j] - d);
                    np2[j] = (short)(k[j] + d);
                }
                auto i1 = table.find(np1);
                auto i2 = table.find(np2);
                blur_n1_[(size_t)j * m_ + i] = i1 == table.end() ? -1 : i1->second;
                blur_n2_[(size_t)j * m_ + i] = i2 == table.end() ? -1 : i2->second;
            }
        }
    }

    // out += filter(in); in/out: [n, vd] row-major.
    void compute(const float* in, float* out, int vd) const {
        std::vector<float> values((size_t)(m_ + 2) * vd, 0.f);
        std::vector<float> new_vals((size_t)(m_ + 2) * vd, 0.f);

        // Splat.
        for (int i = 0; i < n_; i++) {
            for (int j = 0; j <= d_; j++) {
                int o = offsets_[(size_t)i * (d_ + 1) + j] + 1;
                float wgt = weights_[(size_t)i * (d_ + 1) + j];
                for (int v = 0; v < vd; v++)
                    values[(size_t)o * vd + v] += wgt * in[(size_t)i * vd + v];
            }
        }
        // Blur along each of the d+1 directions.
        for (int j = 0; j <= d_; j++) {
            for (int i = 0; i < m_; i++) {
                const float* oldv = &values[(size_t)(i + 1) * vd];
                int i1 = blur_n1_[(size_t)j * m_ + i];
                int i2 = blur_n2_[(size_t)j * m_ + i];
                const float* v1 = i1 >= 0 ? &values[(size_t)(i1 + 1) * vd]
                                          : &values[0];
                const float* v2 = i2 >= 0 ? &values[(size_t)(i2 + 1) * vd]
                                          : &values[0];
                float* nv = &new_vals[(size_t)(i + 1) * vd];
                for (int v = 0; v < vd; v++)
                    nv[v] = oldv[v] + 0.5f * (v1[v] + v2[v]);
            }
            values.swap(new_vals);
        }
        // Slice (with the alternating-blur normalization constant).
        const float alpha = 1.f / (1.f + std::pow(2.f, -(float)d_));
        for (int i = 0; i < n_; i++) {
            for (int v = 0; v < vd; v++) out[(size_t)i * vd + v] = 0.f;
            for (int j = 0; j <= d_; j++) {
                int o = offsets_[(size_t)i * (d_ + 1) + j] + 1;
                float wgt = weights_[(size_t)i * (d_ + 1) + j];
                for (int v = 0; v < vd; v++)
                    out[(size_t)i * vd + v] +=
                        wgt * values[(size_t)o * vd + v] * alpha;
            }
        }
    }

  private:
    int n_ = 0, d_ = 0, m_ = 0;
    std::vector<int> offsets_;
    std::vector<float> weights_;
    std::vector<std::vector<short>> keys_;
    std::vector<int> blur_n1_, blur_n2_;
};

// Symmetric-normalized message passing for one kernel.
struct Pairwise {
    Permutohedral lattice;
    std::vector<float> norm;  // 1/sqrt(K 1)
    float weight;

    void init(const float* feats, int n, int d, float w) {
        weight = w;
        lattice.init(feats, n, d);
        std::vector<float> ones(n, 1.f);
        norm.assign(n, 0.f);
        lattice.compute(ones.data(), norm.data(), 1);
        for (int i = 0; i < n; i++)
            norm[i] = 1.f / std::sqrt(std::max(norm[i], 1e-20f));
    }

    // out += w * D^-1/2 K D^-1/2 q ; q/out: [n, c]
    void apply(const float* q, float* out, std::vector<float>& tmp,
               std::vector<float>& tmp2, int n, int c) const {
        for (int i = 0; i < n; i++)
            for (int v = 0; v < c; v++)
                tmp[(size_t)i * c + v] = q[(size_t)i * c + v] * norm[i];
        lattice.compute(tmp.data(), tmp2.data(), c);
        for (int i = 0; i < n; i++)
            for (int v = 0; v < c; v++)
                out[(size_t)i * c + v] += weight * tmp2[(size_t)i * c + v] * norm[i];
    }
};

}  // namespace

extern "C" {

// probs:  [H*W, C] softmax unary (input), overwritten with refined Q.
// image:  [H*W, 3] raw 0..255 floats.
int dense_crf_inference(float* probs, const float* image, int H, int W, int C,
                        int n_iters, float pos_w, float pos_xy_std, float bi_w,
                        float bi_xy_std, float bi_rgb_std) {
    const int n = H * W;

    std::vector<float> feat_g((size_t)n * 2);
    std::vector<float> feat_b((size_t)n * 5);
    for (int y = 0; y < H; y++) {
        for (int x = 0; x < W; x++) {
            int i = y * W + x;
            feat_g[(size_t)i * 2 + 0] = x / pos_xy_std;
            feat_g[(size_t)i * 2 + 1] = y / pos_xy_std;
            feat_b[(size_t)i * 5 + 0] = x / bi_xy_std;
            feat_b[(size_t)i * 5 + 1] = y / bi_xy_std;
            for (int ch = 0; ch < 3; ch++)
                feat_b[(size_t)i * 5 + 2 + ch] =
                    image[(size_t)i * 3 + ch] / bi_rgb_std;
        }
    }

    Pairwise gauss, bilateral;
    gauss.init(feat_g.data(), n, 2, pos_w);
    bilateral.init(feat_b.data(), n, 5, bi_w);

    std::vector<float> log_unary((size_t)n * C);
    for (size_t i = 0; i < (size_t)n * C; i++)
        log_unary[i] = std::log(std::max(probs[i], 1e-20f));

    std::vector<float> msg((size_t)n * C), tmp((size_t)n * C), tmp2((size_t)n * C);
    std::vector<float> q(probs, probs + (size_t)n * C);

    for (int it = 0; it < n_iters; it++) {
        std::fill(msg.begin(), msg.end(), 0.f);
        gauss.apply(q.data(), msg.data(), tmp, tmp2, n, C);
        bilateral.apply(q.data(), msg.data(), tmp, tmp2, n, C);
        for (int i = 0; i < n; i++) {
            float mx = -1e30f;
            for (int v = 0; v < C; v++) {
                float val = log_unary[(size_t)i * C + v] + msg[(size_t)i * C + v];
                tmp[(size_t)i * C + v] = val;
                if (val > mx) mx = val;
            }
            float sm = 0.f;
            for (int v = 0; v < C; v++) {
                float e = std::exp(tmp[(size_t)i * C + v] - mx);
                q[(size_t)i * C + v] = e;
                sm += e;
            }
            for (int v = 0; v < C; v++) q[(size_t)i * C + v] /= sm;
        }
    }
    std::memcpy(probs, q.data(), (size_t)n * C * sizeof(float));
    return 0;
}

}  // extern "C"
