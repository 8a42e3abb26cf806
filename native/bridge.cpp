// Native engine runtime: seqlock state block + camera kinematics + shadow curve.
//
// The C++ twin of the reference's native layer (gravitas-wasm/src/lib.rs
// PhysicsEngine + sab.rs layout + camera.rs filter + the 75 Hz worker
// heartbeat, physics.worker.ts:111-176) — re-implemented for the TPU build's
// host runtime. The Python render loop reads camera/physics state through a
// torn-read-safe seqlock while this engine integrates camera kinematics and
// writes derived physics (horizon/ISCO/photon sphere/dilation) and the
// 64-point Bardeen shadow curve, either per explicit tick or from a
// background heartbeat thread.
//
// Block layout in float32 indices, mirroring sab.rs:18-22 /
// gravitas-wasm/lib.rs:36-40:
//   CONTROL   @ 0     : [0]=input flag, [1]=mouse dx, [2]=mouse dy, [3]=zoom
//   CAMERA    @ 64    : [0]=r, [1]=theta, [2]=phi, [3]=yaw_vel, [4]=pitch_vel,
//                       [5]=auto_spin
//   PHYSICS   @ 128   : [0]=mass, [1]=spin, [2]=horizon, [3]=isco,
//                       [4]=photon_sphere, [5]=time_dilation(cam),
//                       [6]=ergo_equator, [7]=hawking_rel
//   TELEMETRY @ 256   : [0]=seq (mirrored), [1]=tick count, [2]=last dt
//   LUTS      @ 2048  : [0..127] shadow curve (64 x alpha,beta),
//                       [128..131] extents (a_min, a_max, b_min, b_max)
//
// Build: g++ -O2 -shared -fPIC -o libbridge.so bridge.cpp -lpthread

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>

namespace {

constexpr int kControl = 0;
constexpr int kCamera = 64;
constexpr int kPhysics = 128;
constexpr int kTelemetry = 256;
constexpr int kLuts = 2048;
constexpr int kFloats = 524288;  // 2 MB, as the reference SAB
constexpr int kShadowPoints = 64;

constexpr double kFriction = 5.0;      // velocity *= exp(-5 dt)  (camera.rs)
constexpr double kAutoSpin = 0.15;     // rad/s                    (camera.rs)
constexpr double kMouseGain = 0.005;   // rad per mouse unit
constexpr double kZoomGain = 1.1;      // multiplicative per unit
constexpr double kMinDist = 4.0, kMaxDist = 200.0;
constexpr double kMinPitch = 0.05, kMaxPitch = M_PI - 0.05;

struct CameraState {
  double r = 30.0, theta = M_PI / 2 - 0.25, phi = 0.0;
  double yaw_vel = 0.0, pitch_vel = 0.0;
  bool finite() const {
    return std::isfinite(r) && std::isfinite(theta) && std::isfinite(phi) &&
           std::isfinite(yaw_vel) && std::isfinite(pitch_vel);
  }
};

double clampd(double v, double lo, double hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

struct Engine {
  float buf[kFloats];
  std::atomic<uint32_t> seq{0};
  std::atomic<bool> running{false};
  std::thread heartbeat;
  double mass = 1.0, spin = 0.9;
  double auto_spin = kAutoSpin;
  CameraState cam, last_good;
  // Pending inputs (written by engine_input, consumed by tick).
  std::atomic<double> in_dx{0.0}, in_dy{0.0}, in_zoom{0.0};
  uint64_t ticks = 0;

  // --- derived Kerr radii (gravitas-core kerr.rs mirrors) ------------------
  double horizon() const {
    double d = mass * mass - spin * spin;
    return mass + std::sqrt(d > 0 ? d : 0);
  }
  double photon_sphere(bool prograde) const {
    double as = std::fabs(spin / mass);
    if (as > 1) as = 1;
    double sgn = prograde ? -1.0 : 1.0;
    return 2.0 * mass * (1.0 + std::cos((2.0 / 3.0) * std::acos(sgn * as)));
  }
  double isco() const {
    double as = std::fabs(spin / mass);
    if (as > 1) as = 1;
    double z1 = 1.0 + std::cbrt(1.0 - as * as) *
                          (std::cbrt(1.0 + as) + std::cbrt(1.0 - as));
    double z2 = std::sqrt(3.0 * as * as + z1 * z1);
    double root = (3.0 - z1) * (3.0 + z1 + 2.0 * z2);
    return mass * (3.0 + z2 - std::sqrt(root > 0 ? root : 0));
  }
  double dilation(double r, double theta) const {
    double c = std::cos(theta);
    double sig = r * r + spin * spin * c * c;
    double v = 1.0 - 2.0 * mass * r / sig;
    return std::sqrt(v > 0 ? v : 0);
  }

  // --- Bardeen shadow curve (physics/shadow.rs mirror) ---------------------
  void shadow_curve(double theta_obs) {
    float* out = buf + kLuts;
    double s = std::sin(theta_obs), c = std::cos(theta_obs);
    double ss = std::fabs(s) < 1e-8 ? 1e-8 : std::fabs(s);
    double a = std::fabs(spin) < 1e-8 ? 1e-8 : spin;
    double r_pro = photon_sphere(true), r_ret = photon_sphere(false);
    double amin = 1e30, amax = -1e30, bmin = 1e30, bmax = -1e30;
    for (int i = 0; i < kShadowPoints / 2; ++i) {
      double t = 0.5 * (1.0 - std::cos(M_PI * i / (kShadowPoints / 2 - 1)));
      double r = r_pro + (r_ret - r_pro) * t;
      double delta = r * r - 2.0 * mass * r + a * a;
      double rm = std::fabs(r - mass) < 1e-12 ? 1e-12 : (r - mass);
      double xi = (mass * (r * r - a * a) - r * delta) / (a * rm);
      double eta = r * r * r *
                   (4.0 * a * a * mass - r * (r - 3.0 * mass) * (r - 3.0 * mass)) /
                   (a * a * rm * rm);
      double alpha = -xi / ss;
      double beta2 = eta + a * a * c * c - xi * xi * (c / ss) * (c / ss);
      double beta = beta2 > 0 ? std::sqrt(beta2) : 0.0;
      int j = i, jr = kShadowPoints - 1 - i;
      out[2 * j] = (float)alpha;
      out[2 * j + 1] = (float)beta;
      out[2 * jr] = (float)alpha;   // mirrored lower branch
      out[2 * jr + 1] = (float)-beta;
      if (beta2 > 0) {
        amin = std::min(amin, alpha); amax = std::max(amax, alpha);
        bmin = std::min(bmin, -beta); bmax = std::max(bmax, beta);
      }
    }
    out[2 * kShadowPoints + 0] = (float)amin;
    out[2 * kShadowPoints + 1] = (float)amax;
    out[2 * kShadowPoints + 2] = (float)bmin;
    out[2 * kShadowPoints + 3] = (float)bmax;
  }

  void tick(double dt) {
    // dt clamp <= 0.033 "anti-spiral" (physics.worker.ts:144).
    if (!(dt > 0)) dt = 0.0;
    if (dt > 0.033) dt = 0.033;

    // Consume inputs atomically.
    double dx = in_dx.exchange(0.0);
    double dy = in_dy.exchange(0.0);
    double dz = in_zoom.exchange(0.0);

    // Kinematic filter (camera.rs:42-70): impulse -> velocity, friction,
    // auto-spin, multiplicative zoom, clamps.
    cam.yaw_vel += dx * kMouseGain;
    cam.pitch_vel += dy * kMouseGain;
    double damp = std::exp(-kFriction * dt);
    cam.yaw_vel *= damp;
    cam.pitch_vel *= damp;
    cam.phi += (cam.yaw_vel + auto_spin) * dt;
    cam.theta = clampd(cam.theta + cam.pitch_vel * dt, kMinPitch, kMaxPitch);
    if (dz != 0.0) cam.r = clampd(cam.r * std::pow(kZoomGain, -dz), kMinDist, kMaxDist);

    // NaN validation + rollback (gravitas-wasm lib.rs:339-343).
    if (!cam.finite()) {
      cam = last_good;
    } else {
      last_good = cam;
    }

    // Seqlock write bracket (physics.worker.ts:151-165): odd while writing.
    seq.fetch_add(1, std::memory_order_acq_rel);

    float* c = buf + kCamera;
    c[0] = (float)cam.r; c[1] = (float)cam.theta; c[2] = (float)cam.phi;
    c[3] = (float)cam.yaw_vel; c[4] = (float)cam.pitch_vel;
    c[5] = (float)auto_spin;

    float* p = buf + kPhysics;
    p[0] = (float)mass; p[1] = (float)spin;
    p[2] = (float)horizon(); p[3] = (float)isco();
    p[4] = (float)photon_sphere(true);
    p[5] = (float)dilation(cam.r, cam.theta);
    double ce = std::cos(M_PI / 2);
    p[6] = (float)(mass + std::sqrt(std::max(mass * mass - spin * spin * ce * ce, 0.0)));
    double rp = horizon(), rm2 = mass - std::sqrt(std::max(mass * mass - spin * spin, 0.0));
    p[7] = (float)((rp - rm2) / (2.0 * (rp * rp + spin * spin)));  // surface gravity

    shadow_curve(cam.theta);

    ++ticks;
    float* t = buf + kTelemetry;
    t[1] = (float)ticks; t[2] = (float)dt;

    seq.fetch_add(1, std::memory_order_acq_rel);
    buf[kTelemetry] = (float)seq.load(std::memory_order_acquire);
  }
};

extern "C" {

Engine* engine_create(double mass, double spin) {
  Engine* e = new Engine();
  e->mass = mass;
  e->spin = spin;
  std::memset(e->buf, 0, sizeof(e->buf));
  e->tick(0.0);
  return e;
}

void engine_destroy(Engine* e) {
  if (e->running.load()) {
    e->running.store(false);
    if (e->heartbeat.joinable()) e->heartbeat.join();
  }
  delete e;
}

void engine_set_params(Engine* e, double mass, double spin) {
  e->mass = mass;
  e->spin = spin;
}

void engine_set_auto_spin(Engine* e, double rate) { e->auto_spin = rate; }

void engine_input(Engine* e, double dx, double dy, double zoom) {
  // Accumulate (the reference adds deltas into the SAB CONTROL block).
  e->in_dx.store(e->in_dx.load() + dx);
  e->in_dy.store(e->in_dy.load() + dy);
  e->in_zoom.store(e->in_zoom.load() + zoom);
}

void engine_tick(Engine* e, double dt) { e->tick(dt); }

void engine_start(Engine* e, double hz) {
  if (e->running.exchange(true)) return;
  e->heartbeat = std::thread([e, hz]() {
    auto period = std::chrono::duration<double>(1.0 / hz);
    auto prev = std::chrono::steady_clock::now();
    while (e->running.load(std::memory_order_relaxed)) {
      auto now = std::chrono::steady_clock::now();
      double dt = std::chrono::duration<double>(now - prev).count();
      prev = now;
      e->tick(dt);
      std::this_thread::sleep_for(period);
    }
  });
}

void engine_stop(Engine* e) {
  if (!e->running.exchange(false)) return;
  if (e->heartbeat.joinable()) e->heartbeat.join();
}

// Seqlock read: retry on torn (odd or changed) sequence; returns the
// sequence observed, or 0 if it never stabilized (caller keeps last-good).
uint32_t engine_read(Engine* e, float* out, int offset, int count) {
  for (int attempt = 0; attempt < 8; ++attempt) {
    uint32_t s0 = e->seq.load(std::memory_order_acquire);
    if (s0 & 1u) continue;  // write in progress
    std::memcpy(out, e->buf + offset, count * sizeof(float));
    std::atomic_thread_fence(std::memory_order_acquire);
    uint32_t s1 = e->seq.load(std::memory_order_acquire);
    if (s0 == s1) return s1;
  }
  return 0;
}

uint64_t engine_ticks(Engine* e) { return e->ticks; }

}  // extern "C"
