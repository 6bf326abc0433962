// Deterministic double-precision math for entropy coding.
//
// The reference's decode bug (README.md:111-114 in NJUVISION/PCGCv1): CDF
// tables were rebuilt from float GPU computations that were not
// run-to-run reproducible, so the range decoder could diverge from the
// encoder. Here every quantity that feeds the range coder is computed in
// C++ double precision using ONLY IEEE-754-exact operations (+,-,*,/,
// floor, ldexp) and the polynomial approximations below — no libm, no FMA
// (compiled with -ffp-contract=off) — so the quantized CDFs are
// bit-identical on every IEEE host, independent of compiler or platform.
//
// Accuracy: ~1e-15 relative for exp/log on their reduced ranges, far more
// than the 2^-16 granularity of the quantized CDFs.

#ifndef PCGC_DET_MATH_H_
#define PCGC_DET_MATH_H_

#include <cmath>
#include <cstdint>

namespace pcgc {

// ln(2) split hi+lo so that k*LN2_HI is exact for |k| < 2^10.
constexpr double kLn2Hi = 6.93147180369123816490e-01;  // 0x3FE62E42FEE00000
constexpr double kLn2Lo = 1.90821492927058770002e-10;  // 0x3DEA39EF35793C76
constexpr double kInvLn2 = 1.44269504088896338700e+00;

// exp(x), deterministic. Valid for |x| <= 700; saturates outside.
inline double det_exp(double x) {
  if (x > 709.0) x = 709.0;
  if (x < -745.0) return 0.0;
  // x = k*ln2 + r, |r| <= 0.5*ln2
  double kd = std::floor(x * kInvLn2 + 0.5);
  int k = static_cast<int>(kd);
  double r = (x - kd * kLn2Hi) - kd * kLn2Lo;
  // exp(r) by Taylor series, |r| <= 0.3466: term 17!^-1 * r^17 ~ 2e-25.
  double term = 1.0, sum = 1.0;
  for (int i = 1; i <= 14; ++i) {
    term = term * r / static_cast<double>(i);
    sum += term;
  }
  return std::ldexp(sum, k);  // exact scaling by 2^k
}

// log(x), deterministic. Requires x > 0.
inline double det_log(double x) {
  int e;
  double m = std::frexp(x, &e);  // x = m * 2^e, m in [0.5, 1)
  // shift m to [sqrt(0.5), sqrt(2)) for a small atanh argument
  if (m < 0.70710678118654752440) {
    m *= 2.0;
    e -= 1;
  }
  double s = (m - 1.0) / (m + 1.0);  // |s| <= 0.1716
  double s2 = s * s;
  // log(m) = 2*atanh(s) = 2*(s + s^3/3 + s^5/5 + ...)
  double sum = 0.0;
  double p = s2 * s2 * s2 * s2 * s2 * s2 * s2;  // s^14 scale term via loop below
  // accumulate from the smallest term for stability; 8 terms: s^15/15 ... s/1
  static const double inv_odd[8] = {1.0 / 15, 1.0 / 13, 1.0 / 11, 1.0 / 9,
                                    1.0 / 7, 1.0 / 5, 1.0 / 3, 1.0};
  double powers[8];
  powers[7] = s;               // s^1
  for (int i = 6; i >= 0; --i) powers[i] = powers[i + 1] * s2;
  for (int i = 0; i < 8; ++i) sum += powers[i] * inv_odd[i];
  (void)p;
  double lm = 2.0 * sum;
  double ed = static_cast<double>(e);
  return ed * kLn2Hi + (lm + ed * kLn2Lo);
}

inline double det_sigmoid(double x) {
  if (x >= 0.0) {
    double z = det_exp(-x);
    return 1.0 / (1.0 + z);
  }
  double z = det_exp(x);
  return z / (1.0 + z);
}

inline double det_tanh(double x) {
  if (x > 20.0) return 1.0;
  if (x < -20.0) return -1.0;
  double z = det_exp(2.0 * x);
  return (z - 1.0) / (z + 1.0);
}

inline double det_softplus(double x) {
  // log(1 + exp(x)), stable both tails.
  if (x > 40.0) return x;
  if (x < -40.0) return det_exp(x);
  return det_log(1.0 + det_exp(x));
}

// Laplace CDF with location loc and diversity (scale) b.
inline double laplace_cdf(double x, double loc, double b) {
  double d = x - loc;
  if (d < 0.0) return 0.5 * det_exp(d / b);
  return 1.0 - 0.5 * det_exp(-d / b);
}

}  // namespace pcgc

#endif  // PCGC_DET_MATH_H_
