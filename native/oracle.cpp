// Host-side physics oracle.
//
// An independent C++ implementation of the simulator's physics semantics
// (matching the reference's math: softened monopole gravity as in
// Quadtree.hpp:124-127 evaluated as an exact direct sum, the step order of
// Simulation.hpp:67-75 / 116-163, and the pairwise collision response of
// Simulation.hpp:293-346), used from tests via ctypes as a parity gate for
// the JAX/Pallas implementation (SURVEY.md §7 step 5). Scalar, double
// internally, float in/out: this is a correctness yardstick, not a fast
// path — the TPU kernels are the fast path.
//
// Deliberate differences from the reference, mirrored by the JAX side:
//  - exact rsqrt instead of the Quake-III approximation (ref used
//    -ffast-math; our parity tolerance absorbs this),
//  - collisions resolved in deterministic (i<j) index order instead of the
//    reference's hash-map broad-phase order (order only matters for
//    multi-overlap chains),
//  - no near-field force dropout (reference bug #3 in SURVEY.md).
//
// Build: g++ -O2 -shared -fPIC -o liboracle.so oracle.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline double dot(const double* a, const double* b, int dim) {
    double s = 0.0;
    for (int d = 0; d < dim; ++d) s += a[d] * b[d];
    return s;
}

}  // namespace

extern "C" {

// Exact direct-sum softened accelerations.
// pos: [n*dim], mass: [n], out_acc: [n*dim]
void nb_direct_acc(const float* pos, const float* mass, int n, int dim,
                   float eps_sq, float g, float* out_acc) {
    for (int i = 0; i < n; ++i) {
        double acc[3] = {0.0, 0.0, 0.0};
        for (int j = 0; j < n; ++j) {
            double d[3], d_sq = 0.0;
            for (int k = 0; k < dim; ++k) {
                d[k] = (double)pos[j * dim + k] - (double)pos[i * dim + k];
                d_sq += d[k] * d[k];
            }
            if (d_sq <= 0.0) continue;
            double inv = 1.0 / std::sqrt(d_sq + (double)eps_sq);
            double w = (double)mass[j] * inv * inv * inv;
            for (int k = 0; k < dim; ++k) acc[k] += w * d[k];
        }
        for (int k = 0; k < dim; ++k)
            out_acc[i * dim + k] = (float)((double)g * acc[k]);
    }
}

// Total softened potential energy: -G/2 sum_{i!=j} m_i m_j / sqrt(d^2+eps^2)
double nb_potential_energy(const float* pos, const float* mass, int n,
                           int dim, float eps_sq, float g) {
    double u = 0.0;
    for (int i = 0; i < n; ++i) {
        for (int j = i + 1; j < n; ++j) {
            double d_sq = 0.0;
            for (int k = 0; k < dim; ++k) {
                double dk = (double)pos[j * dim + k] - (double)pos[i * dim + k];
                d_sq += dk * dk;
            }
            if (d_sq <= 0.0) continue;
            u -= (double)mass[i] * (double)mass[j] /
                 std::sqrt(d_sq + (double)eps_sq);
        }
    }
    return (double)g * u;
}

// Resolve one colliding pair in place (reference resolve() semantics).
// p1,p2,v1,v2: [dim] each, modified in place. Returns 1 if the pair
// overlapped, 0 otherwise.
int nb_resolve_pair(float* p1f, float* p2f, float* v1f, float* v2f,
                    float m1, float m2, float r1, float r2, int dim,
                    float impulse) {
    double p1[3], p2[3], v1[3], v2[3];
    for (int k = 0; k < dim; ++k) {
        p1[k] = p1f[k]; p2[k] = p2f[k]; v1[k] = v1f[k]; v2[k] = v2f[k];
    }
    double d[3], v[3];
    for (int k = 0; k < dim; ++k) { d[k] = p2[k] - p1[k]; v[k] = v2[k] - v1[k]; }
    double r = (double)r1 + (double)r2;
    double d_sq = dot(d, d, dim);
    if (d_sq > r * r) return 0;

    double d_dot_v = dot(d, v, dim);
    double w1 = (double)m2 / ((double)m1 + (double)m2);
    double w2 = (double)m1 / ((double)m1 + (double)m2);

    if (d_dot_v >= 0.0 && d_sq > 0.0) {
        // Separating: positional de-penetration only.
        double scale = r / std::sqrt(d_sq) - 1.0;
        for (int k = 0; k < dim; ++k) {
            p1[k] -= d[k] * scale * w1;
            p2[k] += d[k] * scale * w2;
        }
    } else if (d_dot_v < 0.0) {
        // Approaching: time-of-impact rewind + impulse + re-advance.
        double v_sq = dot(v, v, dim);
        double disc = d_dot_v * d_dot_v - v_sq * (d_sq - r * r);
        if (disc < 0.0) disc = 0.0;
        double t = (d_dot_v + std::sqrt(disc)) / v_sq;
        for (int k = 0; k < dim; ++k) { p1[k] -= v1[k] * t; p2[k] -= v2[k] * t; }
        double dn[3];
        for (int k = 0; k < dim; ++k) dn[k] = p2[k] - p1[k];
        double dn_sq = dot(dn, dn, dim);
        double scale = (double)impulse * dot(dn, v, dim) / dn_sq;
        for (int k = 0; k < dim; ++k) {
            v1[k] += dn[k] * scale * w1;
            v2[k] -= dn[k] * scale * w2;
        }
        for (int k = 0; k < dim; ++k) { p1[k] += v1[k] * t; p2[k] += v2[k] * t; }
    }
    for (int k = 0; k < dim; ++k) {
        p1f[k] = (float)p1[k]; p2f[k] = (float)p2[k];
        v1f[k] = (float)v1[k]; v2f[k] = (float)v2[k];
    }
    return 1;
}

// One full reference-semantics step in place:
// acc = gravity; kick; clamp |v|; soft boundary; drift; collide (i<j order).
void nb_step(float* pos, float* vel, const float* mass, const float* radius,
             int n, int dim, float dt, float eps_sq, float g,
             float max_velocity, float boundary_radius,
             float boundary_soft_frac, float boundary_force,
             float boundary_damping, float impulse, int flags) {
    const int kClamp = flags & 1, kBoundary = flags & 2, kCollide = flags & 4;

    std::vector<float> acc(n * dim);
    nb_direct_acc(pos, mass, n, dim, eps_sq, g, acc.data());

    // Kick + clamp (Simulation.hpp:129-138).
    for (int i = 0; i < n; ++i) {
        double v_sq = 0.0;
        for (int k = 0; k < dim; ++k) {
            vel[i * dim + k] += acc[i * dim + k] * dt;
        }
        for (int k = 0; k < dim; ++k)
            v_sq += (double)vel[i * dim + k] * vel[i * dim + k];
        if (kClamp && v_sq > (double)max_velocity * max_velocity) {
            double s = max_velocity / std::sqrt(v_sq);
            for (int k = 0; k < dim; ++k) vel[i * dim + k] *= (float)s;
        }
    }

    // Soft boundary (Simulation.hpp:140-155).
    if (kBoundary) {
        double soft = (double)boundary_radius * boundary_soft_frac;
        for (int i = 0; i < n; ++i) {
            double r_sq = 0.0;
            for (int k = 0; k < dim; ++k)
                r_sq += (double)pos[i * dim + k] * pos[i * dim + k];
            if (r_sq > soft * soft) {
                double dist = std::sqrt(r_sq);
                double force = boundary_force * std::exp(dist / soft - 1.0);
                for (int k = 0; k < dim; ++k) {
                    vel[i * dim + k] +=
                        (float)(-pos[i * dim + k] / dist * force * dt);
                    vel[i * dim + k] *= boundary_damping;
                }
            }
        }
    }

    // Drift (Simulation.hpp:160-163).
    for (int i = 0; i < n * dim; ++i) pos[i] += vel[i] * dt;

    // Collide, deterministic i<j order.
    if (kCollide) {
        for (int i = 0; i < n; ++i)
            for (int j = i + 1; j < n; ++j)
                nb_resolve_pair(pos + i * dim, pos + j * dim,
                                vel + i * dim, vel + j * dim,
                                mass[i], mass[j], radius[i], radius[j],
                                dim, impulse);
    }
}

}  // extern "C"
