// Native CPU N-body oracle engine for nbody_tpu.
//
// Plays the role of the reference's BodySystemCPU golden oracle
// (/root/reference/src/nbody/bodysystemcpu.cpp — behavior re-derived, not
// copied): all-pairs Plummer-softened gravity with 1/r^3 falloff, then the
// damped semi-implicit Euler update v=(v+a*dt)*damping; p+=v*dt.
//
// Layout at the C ABI is AoS (N,4): pos = [x,y,z,mass]*N, vel = [vx,vy,vz,w]*N,
// matching the framework's canonical state. Internally we transpose to SoA so
// the compiler can auto-vectorize the j-loop; the i-loop is OpenMP-parallel.
//
// Build: python -m nbody_tpu.oracle.build   (g++ -O3 -march=native -fopenmp)

#include <cmath>
#include <cstdint>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

template <typename T>
void accel_impl(const T* pos, std::int64_t n, T softening, T* acc) {
    const T eps2 = softening * softening;

    // AoS -> SoA staging for vectorizable inner loops.
    std::vector<T> xs(n), ys(n), zs(n), ms(n);
    for (std::int64_t j = 0; j < n; ++j) {
        xs[j] = pos[4 * j + 0];
        ys[j] = pos[4 * j + 1];
        zs[j] = pos[4 * j + 2];
        ms[j] = pos[4 * j + 3];
    }

#pragma omp parallel for schedule(static)
    for (std::int64_t i = 0; i < n; ++i) {
        const T xi = xs[i], yi = ys[i], zi = zs[i];
        T ax = 0, ay = 0, az = 0;
#pragma omp simd reduction(+ : ax, ay, az)
        for (std::int64_t j = 0; j < n; ++j) {
            const T dx = xs[j] - xi;
            const T dy = ys[j] - yi;
            const T dz = zs[j] - zi;
            const T r2 = dx * dx + dy * dy + dz * dz + eps2;
            const T d = std::sqrt(r2);
            const T s = ms[j] / (d * r2);  // m / r^3
            ax += dx * s;
            ay += dy * s;
            az += dz * s;
        }
        acc[3 * i + 0] = ax;
        acc[3 * i + 1] = ay;
        acc[3 * i + 2] = az;
    }
}

template <typename T>
void step_impl(T* pos, T* vel, std::int64_t n, T dt, T softening, T damping) {
    std::vector<T> acc(3 * n);
    accel_impl(pos, n, softening, acc.data());
#pragma omp parallel for schedule(static)
    for (std::int64_t i = 0; i < n; ++i) {
        for (int c = 0; c < 3; ++c) {
            const T v = (vel[4 * i + c] + acc[3 * i + c] * dt) * damping;
            vel[4 * i + c] = v;
            pos[4 * i + c] += v * dt;
        }
    }
}

}  // namespace

extern "C" {

void nbody_accel_f32(const float* pos, std::int64_t n, float softening, float* acc) {
    accel_impl<float>(pos, n, softening, acc);
}

void nbody_accel_f64(const double* pos, std::int64_t n, double softening, double* acc) {
    accel_impl<double>(pos, n, softening, acc);
}

void nbody_step_f32(float* pos, float* vel, std::int64_t n, float dt, float softening, float damping) {
    step_impl<float>(pos, vel, n, dt, softening, damping);
}

void nbody_step_f64(double* pos, double* vel, std::int64_t n, double dt, double softening, double damping) {
    step_impl<double>(pos, vel, n, dt, softening, damping);
}

// Multi-step driver so benchmark loops don't pay per-step FFI overhead.
void nbody_rollout_f32(float* pos, float* vel, std::int64_t n, float dt, float softening, float damping, std::int64_t steps) {
    for (std::int64_t s = 0; s < steps; ++s) nbody_step_f32(pos, vel, n, dt, softening, damping);
}

void nbody_rollout_f64(double* pos, double* vel, std::int64_t n, double dt, double softening, double damping, std::int64_t steps) {
    for (std::int64_t s = 0; s < steps; ++s) nbody_step_f64(pos, vel, n, dt, softening, damping);
}

int nbody_oracle_num_threads() {
#if defined(_OPENMP)
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
