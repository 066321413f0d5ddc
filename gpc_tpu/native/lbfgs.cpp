// Limited-memory BFGS with strong-Wolfe line search, reverse-communication API.
//
// TPU-native counterpart of the reference's Fortran LBFGS + MCSRCH/MCSTEP
// (reference ndlfortran.f:8-1153, driven via reverse communication from
// COptimisable::lbfgsOptimise, COptimisable.cpp:185-245).  Same architecture:
// the optimizer is native code holding the curvature history; the caller owns
// the objective (here a jitted JAX computation) and feeds (f, g) back per
// request, so device evaluations and native bookkeeping interleave without
// callbacks across the FFI boundary.
//
// Line search: bracket + zoom for the strong Wolfe conditions
// (Nocedal & Wright, Algorithms 3.5/3.6) with bisection-guarded cubic steps.
//
// API (ctypes-friendly):
//   handle = lbfgs_create(n, m)          — n params, m history pairs (ref: m=10)
//   task = lbfgs_step(handle, x, f, g)   — caller supplies f,g at current x;
//                                          x is updated in place to the next
//                                          evaluation point.
//       task = 0: evaluate f,g at new x and call again
//       task = 1: converged (gradient/step tolerance met)
//       task = 2: line-search failure / numerical breakdown (x = best seen)
//   lbfgs_destroy(handle)
//
// Build: g++ -O3 -shared -fPIC lbfgs.cpp -o liblbfgs_native.so

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double C1 = 1e-4;  // sufficient decrease
constexpr double C2 = 0.9;   // curvature

enum Phase { NEW_DIRECTION, BRACKET, ZOOM };

struct State {
  int n;
  int m;
  long iter = 0;
  double grad_tol = 1e-6;
  double step_tol = 1e-12;
  int max_ls = 25;

  std::vector<std::vector<double>> s_hist, y_hist;
  std::vector<double> rho;

  std::vector<double> x0, g0, d;  // line-search origin, gradient, direction
  double f0 = 0.0, dg0 = 0.0;

  Phase phase = NEW_DIRECTION;
  double stp = 1.0;
  // bracket phase: previous trial point
  double prev_stp = 0.0, prev_f = 0.0, prev_dg = 0.0;
  // zoom phase interval
  double lo = 0.0, f_lo = 0.0, dg_lo = 0.0, hi = 0.0, f_hi = 0.0;
  int ls_iter = 0;

  std::vector<double> x_best;
  double f_best = HUGE_VAL;
};

double dot(const double* a, const double* b, int n) {
  double s = 0.0;
  for (int i = 0; i < n; ++i) s += a[i] * b[i];
  return s;
}

double norm_inf(const double* a, int n) {
  double s = 0.0;
  for (int i = 0; i < n; ++i) s = std::max(s, std::fabs(a[i]));
  return s;
}

// Two-loop recursion: d = -H·g using the stored (s, y) pairs.
void two_loop(State* st, const double* g, double* d) {
  const int n = st->n;
  const int k = static_cast<int>(st->s_hist.size());
  std::vector<double> q(g, g + n), alpha(k);
  for (int i = k - 1; i >= 0; --i) {
    alpha[i] = st->rho[i] * dot(st->s_hist[i].data(), q.data(), n);
    for (int j = 0; j < n; ++j) q[j] -= alpha[i] * st->y_hist[i][j];
  }
  double gamma = 1.0;
  if (k > 0) {
    const double yy = dot(st->y_hist[k - 1].data(), st->y_hist[k - 1].data(), n);
    if (yy > 0) gamma = 1.0 / (st->rho[k - 1] * yy);
  }
  for (int j = 0; j < n; ++j) q[j] *= gamma;
  for (int i = 0; i < k; ++i) {
    const double beta = st->rho[i] * dot(st->y_hist[i].data(), q.data(), n);
    for (int j = 0; j < n; ++j) q[j] += (alpha[i] - beta) * st->s_hist[i][j];
  }
  for (int j = 0; j < n; ++j) d[j] = -q[j];
}

void set_trial(State* st, double* x, double stp) {
  st->stp = stp;
  for (int j = 0; j < st->n; ++j) x[j] = st->x0[j] + stp * st->d[j];
}

// Prepare a new search direction from (x, f, g); returns next task.
int begin_direction(State* st, double* x, double f, const double* g) {
  const int n = st->n;
  if (norm_inf(g, n) < st->grad_tol) return 1;
  std::memcpy(st->x0.data(), x, n * sizeof(double));
  std::memcpy(st->g0.data(), g, n * sizeof(double));
  st->f0 = f;
  two_loop(st, g, st->d.data());
  st->dg0 = dot(st->d.data(), g, n);
  if (st->dg0 >= 0.0) {  // not a descent direction: reset history
    st->s_hist.clear();
    st->y_hist.clear();
    st->rho.clear();
    for (int j = 0; j < n; ++j) st->d[j] = -g[j];
    st->dg0 = -dot(g, g, n);
    if (st->dg0 == 0.0) return 1;
  }
  st->phase = BRACKET;
  st->prev_stp = 0.0;
  st->prev_f = st->f0;
  st->prev_dg = st->dg0;
  st->ls_iter = 0;
  const double init =
      st->iter == 0 ? std::min(1.0, 1.0 / norm_inf(st->g0.data(), n)) : 1.0;
  set_trial(st, x, init);
  return 0;
}

// Accept the point at x (with f, g): update history and start next direction.
int accept(State* st, double* x, double f, const double* g) {
  const int n = st->n;
  std::vector<double> s(n), yv(n);
  for (int j = 0; j < n; ++j) {
    s[j] = x[j] - st->x0[j];
    yv[j] = g[j] - st->g0[j];
  }
  const double sy = dot(s.data(), yv.data(), n);
  if (sy > 1e-10 * dot(yv.data(), yv.data(), n)) {
    st->s_hist.push_back(std::move(s));
    st->y_hist.push_back(std::move(yv));
    st->rho.push_back(1.0 / sy);
    if (static_cast<int>(st->s_hist.size()) > st->m) {
      st->s_hist.erase(st->s_hist.begin());
      st->y_hist.erase(st->y_hist.begin());
      st->rho.erase(st->rho.begin());
    }
  }
  st->iter++;
  double step_norm = 0.0;
  for (int j = 0; j < n; ++j)
    step_norm = std::max(step_norm, std::fabs(st->stp * st->d[j]));
  if (step_norm < st->step_tol) return 1;
  st->phase = NEW_DIRECTION;
  return begin_direction(st, x, f, g);
}

// Cubic/bisection interpolation inside [lo, hi] (order-agnostic), guarded so
// the trial stays a fraction inside the interval.
double interp(double lo, double f_lo, double dg_lo, double hi, double f_hi) {
  const double d1 = hi - lo;
  double trial;
  // quadratic using f_lo, dg_lo, f_hi
  const double denom = 2.0 * (f_hi - f_lo - dg_lo * d1);
  if (denom != 0.0 && std::isfinite(f_hi)) {
    trial = lo - dg_lo * d1 * d1 / denom;
  } else {
    trial = lo + 0.5 * d1;
  }
  const double a = std::min(lo, hi), b = std::max(lo, hi);
  const double guard = 0.1 * (b - a);
  if (!(trial > a + guard && trial < b - guard)) trial = 0.5 * (a + b);
  return trial;
}

}  // namespace

extern "C" {

void* lbfgs_create(int n, int m) {
  State* st = new State();
  st->n = n;
  st->m = m > 0 ? m : 10;
  st->x0.resize(n);
  st->g0.resize(n);
  st->d.resize(n);
  st->x_best.resize(n);
  return st;
}

void lbfgs_destroy(void* h) { delete static_cast<State*>(h); }

void lbfgs_set_tols(void* h, double grad_tol, double step_tol, int max_ls) {
  State* st = static_cast<State*>(h);
  st->grad_tol = grad_tol;
  st->step_tol = step_tol;
  st->max_ls = max_ls;
}

long lbfgs_iterations(void* h) { return static_cast<State*>(h)->iter; }

int lbfgs_step(void* h, double* x, double f, const double* g) {
  State* st = static_cast<State*>(h);
  const int n = st->n;

  if (std::isfinite(f) && f < st->f_best) {
    st->f_best = f;
    std::memcpy(st->x_best.data(), x, n * sizeof(double));
  }

  if (st->phase == NEW_DIRECTION) return begin_direction(st, x, f, g);

  // ---- a line-search trial at x = x0 + stp·d just got evaluated -----------
  st->ls_iter++;
  const double dg = dot(st->d.data(), g, n);
  const bool finite = std::isfinite(f);
  const bool armijo = finite && f <= st->f0 + C1 * st->stp * st->dg0;
  const bool wolfe = finite && std::fabs(dg) <= -C2 * st->dg0;

  if (st->ls_iter >= st->max_ls) {
    if (armijo) return accept(st, x, f, g);  // settle for sufficient decrease
    std::memcpy(x, st->x_best.data(), n * sizeof(double));
    return 2;
  }

  if (st->phase == BRACKET) {
    if (!finite || !armijo || (st->prev_stp > 0.0 && f >= st->prev_f)) {
      // minimum bracketed between prev and stp → zoom
      st->phase = ZOOM;
      st->lo = st->prev_stp;
      st->f_lo = st->prev_f;
      st->dg_lo = st->prev_dg;
      st->hi = st->stp;
      st->f_hi = finite ? f : HUGE_VAL;
      set_trial(st, x, interp(st->lo, st->f_lo, st->dg_lo, st->hi, st->f_hi));
      return 0;
    }
    if (wolfe) return accept(st, x, f, g);
    if (dg >= 0.0) {
      st->phase = ZOOM;
      st->lo = st->stp;
      st->f_lo = f;
      st->dg_lo = dg;
      st->hi = st->prev_stp;
      st->f_hi = st->prev_f;
      set_trial(st, x, interp(st->lo, st->f_lo, st->dg_lo, st->hi, st->f_hi));
      return 0;
    }
    // keep expanding
    st->prev_stp = st->stp;
    st->prev_f = f;
    st->prev_dg = dg;
    set_trial(st, x, 2.0 * st->stp);
    return 0;
  }

  // ---- ZOOM ---------------------------------------------------------------
  if (!finite || !armijo || f >= st->f_lo) {
    st->hi = st->stp;
    st->f_hi = finite ? f : HUGE_VAL;
  } else {
    if (wolfe) return accept(st, x, f, g);
    if (dg * (st->hi - st->lo) >= 0.0) {
      st->hi = st->lo;
      st->f_hi = st->f_lo;
    }
    st->lo = st->stp;
    st->f_lo = f;
    st->dg_lo = dg;
  }
  if (std::fabs(st->hi - st->lo) < st->step_tol * std::max(1.0, std::fabs(st->lo))) {
    // interval collapsed: take lo if it improved, else fail
    if (st->f_lo < st->f0) {
      set_trial(st, x, st->lo);
      // caller will re-evaluate at lo; accept on next call via max_ls path
      st->ls_iter = st->max_ls - 1;
      return 0;
    }
    std::memcpy(x, st->x_best.data(), n * sizeof(double));
    return 2;
  }
  set_trial(st, x, interp(st->lo, st->f_lo, st->dg_lo, st->hi, st->f_hi));
  return 0;
}

}  // extern "C"
