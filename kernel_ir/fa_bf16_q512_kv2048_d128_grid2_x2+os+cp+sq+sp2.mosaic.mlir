module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x1x2048x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x1x2048x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<512x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<512x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<512x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 4, 4, 1>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 1, 512, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 1, 2048, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 1, 2048, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 1, 512, 128>}]} {
    %cst = arith.constant dense<0.000000e+00> : vector<512x1xf32>
    %cst_0 = arith.constant dense<0.127517432> : vector<512x128xf32>
    %cst_1 = arith.constant dense<0.000000e+00> : vector<512x128xf32>
    %cst_2 = arith.constant dense<0.000000e+00> : vector<512xf32>
    %cst_3 = arith.constant dense<0xFF800000> : vector<512xf32>
    %cst_4 = arith.constant dense<0.000000e+00> : vector<512x1024xf32>
    %c0 = arith.constant 0 : index
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %2 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %3 = vector.shape_cast %2 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %4 = arith.extf %3 : vector<512x128xbf16> to vector<512x128xf32>
    %5 = arith.mulf %4, %cst_0 : vector<512x128xf32>
    %6 = arith.truncf %5 : vector<512x128xf32> to vector<512x128xbf16>
    %7 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x1x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %8 = vector.shape_cast %7 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    %9 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x1x2048x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x2048x128xbf16>
    %10 = vector.shape_cast %9 : vector<1x1x2048x128xbf16> to vector<2048x128xbf16>
    scf.if %0 {
      %12 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
      %13 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
      %14 = tpu.matmul %6, %12, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
      %15 = vector.multi_reduction <maximumf>, %14, %cst_3 [1] : vector<512x1024xf32> to vector<512xf32>
      %16 = vector.shape_cast %15 : vector<512xf32> to vector<512x1xf32>
      %17 = vector.broadcast %16 : vector<512x1xf32> to vector<512x1024xf32>
      %18 = arith.subf %14, %17 : vector<512x1024xf32>
      %19 = math.exp2 %18 : vector<512x1024xf32>
      %20 = arith.truncf %19 : vector<512x1024xf32> to vector<512x1024xbf16>
      %21 = vector.multi_reduction <add>, %19, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %22 = vector.shape_cast %21 : vector<512xf32> to vector<512x1xf32>
      %23 = tpu.matmul %20, %13, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %24 = vector.extract_strided_slice %8 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
      %25 = vector.extract_strided_slice %10 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
      %26 = tpu.matmul %6, %24, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
      %27 = vector.multi_reduction <maximumf>, %26, %cst_3 [1] : vector<512x1024xf32> to vector<512xf32>
      %28 = vector.shape_cast %27 : vector<512xf32> to vector<512x1xf32>
      %29 = vector.broadcast %28 : vector<512x1xf32> to vector<512x1024xf32>
      %30 = arith.subf %26, %29 : vector<512x1024xf32>
      %31 = math.exp2 %30 : vector<512x1024xf32>
      %32 = arith.truncf %31 : vector<512x1024xf32> to vector<512x1024xbf16>
      %33 = vector.multi_reduction <add>, %31, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %34 = vector.shape_cast %33 : vector<512xf32> to vector<512x1xf32>
      %35 = tpu.matmul %32, %25, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %36 = arith.maximumf %16, %28 : vector<512x1xf32>
      %37 = vector.broadcast %36 : vector<512x1xf32> to vector<512x128xf32>
      %38 = arith.subf %16, %36 : vector<512x1xf32>
      %39 = math.exp2 %38 : vector<512x1xf32>
      %40 = arith.mulf %22, %39 : vector<512x1xf32>
      %41 = arith.addf %40, %cst : vector<512x1xf32>
      %42 = vector.broadcast %39 : vector<512x1xf32> to vector<512x128xf32>
      %43 = arith.mulf %23, %42 : vector<512x128xf32>
      %44 = arith.addf %43, %cst_1 : vector<512x128xf32>
      %45 = arith.subf %28, %36 : vector<512x1xf32>
      %46 = math.exp2 %45 : vector<512x1xf32>
      %47 = arith.mulf %34, %46 : vector<512x1xf32>
      %48 = arith.addf %41, %47 : vector<512x1xf32>
      %49 = vector.broadcast %46 : vector<512x1xf32> to vector<512x128xf32>
      %50 = arith.mulf %35, %49 : vector<512x128xf32>
      %51 = arith.addf %44, %50 : vector<512x128xf32>
      %52 = vector.broadcast %48 : vector<512x1xf32> to vector<512x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %37 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %52 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %51 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %11 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %11 {
      %12 = vector.load %arg9[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %13 = vector.load %arg10[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %14 = vector.load %arg8[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %15 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
      %16 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
      %17 = tpu.matmul %6, %15, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
      %18 = vector.multi_reduction <maximumf>, %17, %cst_3 [1] : vector<512x1024xf32> to vector<512xf32>
      %19 = vector.shape_cast %18 : vector<512xf32> to vector<512x1xf32>
      %20 = vector.broadcast %19 : vector<512x1xf32> to vector<512x1024xf32>
      %21 = arith.subf %17, %20 : vector<512x1024xf32>
      %22 = math.exp2 %21 : vector<512x1024xf32>
      %23 = arith.truncf %22 : vector<512x1024xf32> to vector<512x1024xbf16>
      %24 = vector.multi_reduction <add>, %22, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %25 = vector.shape_cast %24 : vector<512xf32> to vector<512x1xf32>
      %26 = tpu.matmul %23, %16, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %27 = vector.extract_strided_slice %8 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
      %28 = vector.extract_strided_slice %10 {offsets = [1024, 0], sizes = [1024, 128], strides = [1, 1]} : vector<2048x128xbf16> to vector<1024x128xbf16>
      %29 = tpu.matmul %6, %27, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
      %30 = vector.multi_reduction <maximumf>, %29, %cst_3 [1] : vector<512x1024xf32> to vector<512xf32>
      %31 = vector.shape_cast %30 : vector<512xf32> to vector<512x1xf32>
      %32 = vector.broadcast %31 : vector<512x1xf32> to vector<512x1024xf32>
      %33 = arith.subf %29, %32 : vector<512x1024xf32>
      %34 = math.exp2 %33 : vector<512x1024xf32>
      %35 = arith.truncf %34 : vector<512x1024xf32> to vector<512x1024xbf16>
      %36 = vector.multi_reduction <add>, %34, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %37 = vector.shape_cast %36 : vector<512xf32> to vector<512x1xf32>
      %38 = tpu.matmul %35, %28, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %39 = arith.maximumf %19, %31 : vector<512x1xf32>
      %40 = vector.broadcast %39 : vector<512x1xf32> to vector<512x128xf32>
      %41 = arith.maximumf %12, %40 : vector<512x128xf32>
      %42 = vector.extract_strided_slice %41 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %43 = arith.subf %12, %41 : vector<512x128xf32>
      %44 = math.exp2 %43 : vector<512x128xf32>
      %45 = arith.subf %19, %42 : vector<512x1xf32>
      %46 = math.exp2 %45 : vector<512x1xf32>
      %47 = arith.mulf %25, %46 : vector<512x1xf32>
      %48 = arith.addf %47, %cst : vector<512x1xf32>
      %49 = vector.broadcast %46 : vector<512x1xf32> to vector<512x128xf32>
      %50 = arith.mulf %26, %49 : vector<512x128xf32>
      %51 = arith.addf %50, %cst_1 : vector<512x128xf32>
      %52 = arith.subf %31, %42 : vector<512x1xf32>
      %53 = math.exp2 %52 : vector<512x1xf32>
      %54 = arith.mulf %37, %53 : vector<512x1xf32>
      %55 = arith.addf %48, %54 : vector<512x1xf32>
      %56 = vector.broadcast %53 : vector<512x1xf32> to vector<512x128xf32>
      %57 = arith.mulf %38, %56 : vector<512x128xf32>
      %58 = arith.addf %51, %57 : vector<512x128xf32>
      %59 = arith.mulf %13, %44 : vector<512x128xf32>
      %60 = vector.broadcast %55 : vector<512x1xf32> to vector<512x128xf32>
      %61 = arith.addf %59, %60 : vector<512x128xf32>
      %62 = vector.extract_strided_slice %44 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %63 = vector.broadcast %62 : vector<512x1xf32> to vector<512x128xf32>
      %64 = arith.mulf %14, %63 : vector<512x128xf32>
      %65 = arith.addf %64, %58 : vector<512x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %41 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %61 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %65 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    scf.if %1 {
      %12 = vector.load %arg10[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %13 = vector.load %arg8[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %14 = vector.broadcast %12 : vector<512x1xf32> to vector<512x128xf32>
      %15 = arith.divf %13, %14 : vector<512x128xf32>
      %16 = arith.truncf %15 : vector<512x128xf32> to vector<512x128xbf16>
      %17 = vector.shape_cast %16 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %17 {strides = array<i32>} : memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

